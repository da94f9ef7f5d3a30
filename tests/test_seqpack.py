"""Sequence packing (training-example assembly): python-oracle
agreement, shard invariance, example stats, plan shape."""

import pytest
from pyspark.sql import functions as F

from gliner_spark.operators.seqpack import example_stats, pack_sequences


def py_pack(rows, budget):
    """Independent reference: plain running sum over sorted ids."""
    out = {}
    cum = 0
    for i, n in sorted(rows):
        out[i] = (cum, cum // budget, cum % budget)
        cum += n
    return out


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


class TestPackSequences:
    ROWS = [(i * 7 % 97, (i * 13) % 40 + 1) for i in range(97)]  # shuffled ids

    def test_matches_python_oracle(self, spark):
        got = {
            r.doc_id: (r.cum_before, r.example_id, r.offset_in_example)
            for r in pack_sequences(
                docs_df(spark, self.ROWS), budget=64, shard_size=10
            ).collect()
        }
        assert got == py_pack(self.ROWS, 64)

    def test_shard_size_never_changes_results(self, spark):
        base = None
        for shard in (1, 7, 50, 10_000):  # incl. one-doc and one-shard
            got = sorted(
                (r.doc_id, r.cum_before, r.example_id)
                for r in pack_sequences(
                    docs_df(spark, self.ROWS), budget=100, shard_size=shard
                ).collect()
            )
            base = base or got
            assert got == base, shard

    def test_example_stats(self, spark):
        budget = 64
        packed = pack_sequences(
            docs_df(spark, self.ROWS), budget=budget, shard_size=10
        )
        stats = {
            r.example_id: (r.n_docs, r.n_tokens_example, r.overflow)
            for r in example_stats(packed, budget).collect()
        }
        # independent recomputation
        oracle = py_pack(self.ROWS, budget)
        from collections import defaultdict

        by_ex = defaultdict(list)
        for i, n in self.ROWS:
            by_ex[oracle[i][1]].append((oracle[i][0], n))
        for ex, members in by_ex.items():
            start = min(c for c, _ in members)
            tot = sum(n for _, n in members)
            want_overflow = max(0, start + tot - (ex + 1) * budget)
            assert stats[ex] == (len(members), tot, want_overflow), ex
        # every example except possibly the last overflows OR the next
        # example starts exactly at its boundary — no token is lost
        total = sum(n for _, n in self.ROWS)
        assert sum(t for _, t, _ in stats.values()) == total

    def test_degenerate_inputs(self, spark):
        assert pack_sequences(docs_df(spark, []), budget=10).count() == 0
        one = pack_sequences(docs_df(spark, [(5, 3)]), budget=10).first()
        assert (one.cum_before, one.example_id, one.offset_in_example) == (0, 0, 0)
        with pytest.raises(ValueError):
            pack_sequences(docs_df(spark, [(1, 1)]), budget=0)

    def test_no_global_window_over_corpus(self, spark):
        """The prefix sum must never plan a single-partition window
        over the corpus: the only Exchange SinglePartition feeds the
        shard-count-sized offsets AGGREGATE; the corpus-side window is
        hash-partitioned by _shard; the offsets come back broadcast."""
        phys = (
            pack_sequences(docs_df(spark, self.ROWS), budget=64, shard_size=10)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert phys.count("Exchange SinglePartition") == 1
        assert "hashpartitioning(_shard" in phys
        assert "BroadcastHashJoin" in phys


class TestChunkDocuments:
    def py_chunks(self, text, w, s):
        ws = text.split(" ")
        L = len(ws)
        nc = 1 if L <= w else (L - w + s - 1) // s + 1
        return [
            (i, " ".join(ws[i * s : i * s + w]), min(w, L - i * s))
            for i in range(nc)
        ]

    def test_matches_python_oracle(self, spark):
        from gliner_spark.operators.seqpack import chunk_documents

        texts = [
            " ".join(f"w{j % 13}" for j in range(n))
            for n in (1, 7, 8, 9, 15, 16, 17, 30, 100)
        ] + [""]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {}
        for r in chunk_documents(df, window=8, stride=5).collect():
            got.setdefault(r.doc_id, []).append(
                (r.chunk_idx, r.chunk_text, r.n_words_chunk)
            )
        for i, t in enumerate(texts):
            assert sorted(got[i]) == self.py_chunks(t, 8, 5), (i, t)

    def test_no_overlap_default_covers_exactly(self, spark):
        from gliner_spark.operators.seqpack import chunk_documents

        df = spark.createDataFrame(
            [(1, " ".join(f"x{j}" for j in range(25)))],
            "doc_id long, text string",
        )
        rows = sorted(
            (r.chunk_idx, r.n_words_chunk)
            for r in chunk_documents(df, window=10).collect()
        )
        assert rows == [(0, 10), (1, 10), (2, 5)]
        with pytest.raises(ValueError):
            chunk_documents(df, window=0)

    def test_gapped_sampling_stride_gt_window(self, spark):
        """stride > window = window SAMPLING with gaps: chunks are
        emitted only while the start is inside the document, so no
        chunk is ever empty and n_words_chunk >= 1 (the covering
        formula would emit a degenerate past-the-end tail chunk)."""
        from gliner_spark.operators.seqpack import chunk_documents

        for L in (3, 7, 19, 20, 21, 30):
            df = spark.createDataFrame(
                [(1, " ".join(f"x{j}" for j in range(L)))],
                "doc_id long, text string",
            )
            rows = sorted(
                (r.chunk_idx, r.chunk_text, r.n_words_chunk)
                for r in chunk_documents(df, window=5, stride=10).collect()
            )
            want_n = 1 if L <= 5 else (L + 9) // 10
            assert len(rows) == want_n, L
            for i, text, nw in rows:
                assert nw >= 1 and text != "", (L, i)
                assert nw == min(5, L - i * 10), (L, i)
