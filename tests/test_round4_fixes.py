"""Regression tests for the round-4 bug fixes (round-3 ADVICE items).

Each test reproduces the original failure mode and pins the fixed
behavior. The other round-3 ADVICE fixes live with their operators:
short-doc survival in test_streaming_neardup.py, string-id
segment_dedup in test_dedup.py, lineage partition isolation in
test_graph_sink.py, userinfo URLs in test_urls.py.
"""

import numpy as np

from gliner_spark.model.encoder import DeterministicEncoder


class TestScoreCacheLabelKeyBound:
    """_score_cache is a dict of per-label-key sub-caches; r3 bounded
    each sub-cache at 2M entries but never the number of label keys —
    every distinct label set (incl. predict_with_embeds digests) added
    another unbounded-count sub-cache on a long-lived executor
    singleton (ADVICE #4)."""

    def test_label_key_count_is_capped(self):
        enc = DeterministicEncoder(dim=8)
        labels = enc.embed_labels(["x", "y"])
        sidx = np.array([[0, 0], [0, 1]])
        for i in range(100):
            enc.score_spans_tokens(["aa", "bb"], sidx, labels, f"key-{i}")
        assert len(enc._score_cache) <= 32

    def test_eviction_is_fifo_and_values_stable(self):
        enc = DeterministicEncoder(dim=8)
        labels = enc.embed_labels(["x", "y"])
        sidx = np.array([[0, 0], [0, 1], [1, 1]])
        first = enc.score_spans_tokens(["aa", "bb"], sidx, labels, "k0")
        for i in range(1, 40):  # push k0 out of the FIFO
            enc.score_spans_tokens(["aa", "bb"], sidx, labels, f"k{i}")
        assert "k0" not in enc._score_cache
        # recompute after eviction: bit-identical (cache is transparent)
        again = enc.score_spans_tokens(["aa", "bb"], sidx, labels, "k0")
        np.testing.assert_array_equal(first, again)


def test_kge_surface_cache_key_count_bounded():
    """The per-(dim, seed) sub-cache dict must not grow without bound on
    a long-lived executor (same class of leak as the round-3
    encoder._score_cache advice)."""
    from types import SimpleNamespace

    import numpy as np

    from gliner_spark.operators import kge_scores as K

    K._SURFACE_CACHE.clear()
    for seed in range(K._SURFACE_CACHE_KEYS_MAX + 8):
        enc = SimpleNamespace(
            dim=4, seed=seed, token_embedding=lambda w: np.ones(4)
        )
        K._embed_batch(enc, ["alpha"])
    assert len(K._SURFACE_CACHE) <= K._SURFACE_CACHE_KEYS_MAX
    K._SURFACE_CACHE.clear()
