"""Corpus-LM fluency statistics (operators/lmstats.py): known-answer
coverage, boundary determinism, and non-degenerate spread on the test
corpus."""

import pandas as pd

from pyspark.sql import functions as F

from gliner_spark.operators.lmstats import bigram_array, lm_fluency


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBigramArray:
    def test_known_answers(self, spark):
        out = (
            _docs(spark, [(1, "a b c"), (2, "a a a"), (3, "solo"), (4, "x y")])
            .select("doc_id", bigram_array(F.col("text")).alias("bg"))
            .collect()
        )
        got = {r.doc_id: r.bg for r in out}
        assert got[1] == ["a b", "b c"]
        assert got[2] == ["a a", "a a"]  # duplicates KEPT (LM counts)
        assert got[3] == []
        assert got[4] == ["x y"]


class TestLmFluency:
    def test_known_answer_coverage(self, spark):
        # corpus: 'a'×6, 'b'×3, 'z'×1 → top-2 vocab = {a, b};
        # bigrams: 'a a'×3, 'a b'×2, 'b a'×1, 'b z'×1 → top-2 = {a a, a b}
        docs = _docs(
            spark,
            [
                (1, "a a a a b"),   # bigrams: aa aa aa ab
                (2, "a b a b z"),   # bigrams: ab ba ab bz
            ],
        )
        out = {
            r.doc_id: r.asDict()
            for r in lm_fluency(docs, vocab_k=2, bigram_k=2).collect()
        }
        d1, d2 = out[1], out[2]
        assert (d1["n_tokens"], d1["n_oov"]) == (5, 0)
        assert (d1["n_bigrams"], d1["n_common_bigrams"]) == (4, 4)
        assert d1["bigram_hit_rate"] == 1.0
        assert (d2["n_tokens"], d2["n_oov"]) == (5, 1)  # 'z' is OOV
        assert (d2["n_bigrams"], d2["n_common_bigrams"]) == (4, 2)  # ab ab
        assert d2["oov_rate"] == 0.2 and d2["bigram_hit_rate"] == 0.5

    def test_short_doc_null_hit_rate(self, spark):
        out = lm_fluency(
            _docs(spark, [(1, "solo"), (2, "a b")]), vocab_k=10, bigram_k=10
        ).collect()
        got = {r.doc_id: r for r in out}
        assert got[1].n_bigrams == 0 and got[1].bigram_hit_rate is None
        assert got[2].bigram_hit_rate == 1.0

    def test_topk_boundary_is_deterministic(self, spark):
        # four words with EQUAL counts: top-2 must be the lexicographic
        # first two (count DESC, gram ASC), same as the SQL oracle
        docs = _docs(spark, [(1, "d c b a"), (2, "a b c d")])
        out = lm_fluency(docs, vocab_k=2, bigram_k=10).collect()
        # vocab = {a, b}: every doc has exactly 2 OOV (c, d)
        assert all(r.n_oov == 2 for r in out)

    def test_corpus_spread_is_nondegenerate(self, spark):
        """At the gate's k values the test corpus produces a real
        spread of rates — the gate asserts something."""
        import __spark_entry__ as entry

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = lm_fluency(
            docs, vocab_k=entry.LM_VOCAB_K, bigram_k=entry.LM_BIGRAM_K
        ).toPandas()
        assert len(out) == docs.count()
        assert out["oov_rate"].nunique() > 10
        assert out["bigram_hit_rate"].nunique() > 10
        assert 0 < out["oov_rate"].mean() < 1
        assert 0 < out["bigram_hit_rate"].mean() < 1

    def test_no_corpus_text_shuffle(self, spark):
        """The document text feeds only narrow projections; every
        exchange carries grams or (doc_id, count) pairs."""
        docs = _docs(spark, [(1, "a b c"), (2, "b c d")])
        plan = (
            lm_fluency(docs, vocab_k=2, bigram_k=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        # every Exchange carries grams or (doc_id, counts) — the text
        # column must never appear in a shuffle's output schema (the
        # final doc_id-keyed count joins may sort-merge; they move two
        # ints per document, not the corpus)
        for line in plan.splitlines():
            if "Exchange" in line:
                assert "text#" not in line, line
