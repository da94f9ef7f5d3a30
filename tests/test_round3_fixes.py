"""Regression tests for the round-3 bug fixes (round-2 ADVICE items).

Each test reproduces the original failure mode and pins the fixed
behavior, so none of these can silently regress.
"""

import numpy as np
import pytest

from gliner_spark.model.encoder import DeterministicEncoder
from gliner_spark.model.pipeline import GLiNERPipeline, PipelineConfig


class TestCacheEvictionOrder:
    """encoder caches: a clear AFTER computing `missing` evicted this
    call's cache hits and KeyError'd the fill loop (ADVICE #1)."""

    def test_span_cache_overflow_mid_call(self):
        enc = DeterministicEncoder(dim=8)
        sidx = np.array([[0, 0], [1, 1], [0, 1]])
        first = enc.span_representations_tokens(["aa", "bb"], sidx)
        # simulate a full cache containing this call's hit keys: the old
        # code computed `missing` (empty), then cleared, then KeyError'd
        class _Full(dict):
            def __len__(self):
                return 3_000_000

        enc._span_cache = _Full(enc._span_cache)
        again = enc.span_representations_tokens(["aa", "bb"], sidx)
        np.testing.assert_array_equal(first, again)

    def test_score_cache_overflow_mid_call(self):
        enc = DeterministicEncoder(dim=8)
        labels = enc.embed_labels(["x", "y"])
        sidx = np.array([[0, 0], [0, 1], [1, 1]])
        first = enc.score_spans_tokens(["aa", "bb"], sidx, labels, "k")

        class _Full(dict):
            def __len__(self):
                return 3_000_000

        # wrap the per-label-set sub-dict (the level the bound guards)
        enc._score_cache["k"] = _Full(enc._score_cache["k"])
        again = enc.score_spans_tokens(["aa", "bb"], sidx, labels, "k")
        np.testing.assert_array_equal(first, again)


class TestFactoryCacheKey:
    """pipeline cache: two lambdas with identical qualnames but
    different closures must NOT share a cached pipeline (ADVICE #2)."""

    def test_distinct_closures_distinct_keys(self):
        from gliner_spark.operators.extract import _factory_key

        def make(path):
            return lambda: path  # same qualname for every `path`

        k1 = _factory_key(make("model_a.onnx"))
        k2 = _factory_key(make("model_b.onnx"))
        assert k1 != k2
        # and identical closures agree (the cache still hits)
        assert _factory_key(make("model_a.onnx")) == k1

    def test_explicit_key_wins(self):
        from gliner_spark.operators.extract import _factory_key

        f = lambda: None  # noqa: E731
        assert _factory_key(f, encoder_key="prod-v3") == ("explicit", "prod-v3")

    def test_distinct_pipelines_from_colliding_lambdas(self):
        from gliner_spark.operators.extract import _get_pipeline

        def make(seed):
            return lambda: DeterministicEncoder(dim=8, seed=seed)

        p1 = _get_pipeline(["x"], [], {"threshold": 0.5}, encoder_factory=make(1))
        p2 = _get_pipeline(["x"], [], {"threshold": 0.5}, encoder_factory=make(2))
        assert p1.encoder.seed == 1 and p2.encoder.seed == 2


class TestCcNonConvergence:
    """star CC: a pre-convergence exit must raise, not silently emit
    non-root components (ADVICE #3)."""

    def test_raises_when_max_iter_too_low(self, spark):
        from gliner_spark.operators.canonicalize import connected_components

        # a long chain needs >1 star round; max_iter=1 must refuse
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(200)], "src long, dst long"
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(edges, algorithm="star", max_iter=1).collect()

    def test_converged_chain_still_correct(self, spark):
        from gliner_spark.operators.canonicalize import connected_components

        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(200)], "src long, dst long"
        )
        out = connected_components(edges, algorithm="star")
        comps = {r.node: r.component for r in out.collect()}
        assert set(comps.values()) == {0} and len(comps) == 201


class TestSessionMaxWidthGuard:
    """session backends: a silently ignored PipelineConfig.max_width
    changed span-width coverage (ADVICE #4) — now a loud mismatch."""

    def test_mismatch_raises(self):
        from gliner_spark.model.ort_testing import fake_span_encoder_factory

        enc = fake_span_encoder_factory()  # max_width=12
        with pytest.raises(ValueError, match="max_width"):
            GLiNERPipeline(["x"], [], PipelineConfig(max_width=8), encoder=enc)

    def test_matching_width_ok(self):
        from gliner_spark.model.ort_testing import fake_span_encoder_factory

        enc = fake_span_encoder_factory()
        pipe = GLiNERPipeline(["x"], [], PipelineConfig(max_width=12), encoder=enc)
        assert pipe.is_session_backend


class TestEnsureParallelismFallback:
    """non-file sources: probe actual partitions instead of forcing a
    repartition that could SHRINK a many-partition source (ADVICE #5)."""

    def test_many_partition_memory_source_untouched(self, spark):
        from gliner_spark.operators.extract import _ensure_parallelism

        par = spark.sparkContext.defaultParallelism
        df = spark.range(1000).repartition(par + 8)
        out = _ensure_parallelism(df, None)
        assert out.rdd.getNumPartitions() == par + 8  # no forced shrink

    def test_small_memory_source_fanned_out(self, spark):
        from gliner_spark.operators.extract import _ensure_parallelism

        df = spark.range(100).coalesce(1)
        out = _ensure_parallelism(df, None)
        assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
