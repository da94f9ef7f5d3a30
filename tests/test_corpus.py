"""Corpus keep-list: the combined quality + dedup + decontamination
verdict table."""

import pytest

from gliner_spark.operators.corpus import corpus_keep_list

GOOD = "the quick brown fox jumps over a lazy dog near the river bank today"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, GOOD),                                # clean
            (2, GOOD),                                # exact dup of 1
            (3, "too short"),                         # fails quality (min words)
            (4, GOOD.replace("river", "ocean")),      # clean variant
        ],
        "doc_id long, text string",
    )


class TestKeepList:
    def test_verdicts_and_reasons(self, spark, docs):
        out = {r.doc_id: r for r in corpus_keep_list(docs).collect()}
        assert out[1].keep and out[1].reasons == []
        assert not out[2].keep and out[2].reasons == ["exact_dup"]
        assert not out[3].keep and out[3].reasons == ["quality"]
        assert out[4].keep

    def test_contamination_reason(self, spark, docs):
        eval_df = spark.createDataFrame(
            [(99, GOOD)], "doc_id long, text string"
        )
        out = {r.doc_id: r for r in corpus_keep_list(docs, eval_df).collect()}
        assert not out[1].keep and "contaminated" in out[1].reasons
        # the dup is both a dup AND contaminated — reasons sorted
        assert out[2].reasons == ["contaminated", "exact_dup"]
        assert out[3].reasons == ["quality"]  # too short to share an 8-gram

    def test_one_row_per_doc(self, docs):
        assert corpus_keep_list(docs).count() == docs.count()


class TestCapPerKey:
    def skewed(self, spark, seed=7):
        import random

        rng = random.Random(seed)
        # Zipf-ish: host k gets ~2^k rows, ids shuffled so phase-1
        # buckets see an arbitrary interleaving
        rows = []
        rid = 0
        for k in range(6):
            for _ in range(2**k):
                rows.append((rid, f"h{k}"))
                rid += 1
        rng.shuffle(rows)
        return spark.createDataFrame(rows, "doc_id long, host string")

    def test_matches_single_window_reference(self, spark):
        from pyspark.sql import Window, functions as F

        from gliner_spark.operators.corpus import cap_per_key

        df = self.skewed(spark)
        got = sorted(
            map(
                tuple,
                cap_per_key(df, "host", 3, "doc_id")
                .select("host", "doc_id", "rank")
                .collect(),
            )
        )
        w = Window.partitionBy("host").orderBy("doc_id")
        want = sorted(
            map(
                tuple,
                df.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= 3)
                .select("host", "doc_id", "rank")
                .collect(),
            )
        )
        assert got == want

    def test_cap_respected_and_small_keys_intact(self, spark):
        from gliner_spark.operators.corpus import cap_per_key

        out = cap_per_key(self.skewed(spark), "host", 3, "doc_id")
        by_host = {}
        for r in out.collect():
            by_host.setdefault(r.host, []).append(r.rank)
        assert all(len(v) <= 3 for v in by_host.values())
        assert sorted(by_host["h0"]) == [1]  # 1-row host survives whole
        assert sorted(by_host["h5"]) == [1, 2, 3]  # hot host capped
