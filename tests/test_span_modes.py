"""Span representation modes (M5) — SpanRepLayer factory parity surface
(gliner/modeling/span_rep.py:687-760, 11 span-grid modes; token_level is
this build's token-scoring pipeline mode)."""

import numpy as np
import pytest

from gliner_spark.kernel.spans import span_idx_array
from gliner_spark.model.encoder import DeterministicEncoder
from gliner_spark.model.pipeline import GLiNERPipeline, PipelineConfig

MODES = DeterministicEncoder.SPAN_MODES
K = 6
TEXT = "maria runs the acme data platform in lisbon with spark"


@pytest.fixture(scope="module")
def enc():
    return DeterministicEncoder(dim=32, seed=42)


@pytest.fixture(scope="module")
def setup(enc):
    tokens = TEXT.split()
    h = enc.embed_tokens(tokens)
    sidx = span_idx_array(len(tokens), K)
    return tokens, h, sidx


class TestSpanModes:
    @pytest.mark.parametrize("mode", MODES)
    def test_shape_norm_determinism(self, enc, setup, mode):
        _, h, sidx = setup
        rep = enc.span_representations_mode(h, sidx, K, mode)
        assert rep.shape == (len(sidx), 32)
        norms = np.linalg.norm(rep, axis=1)
        assert (norms <= 1.0 + 1e-9).all()
        assert np.array_equal(rep, enc.span_representations_mode(h, sidx, K, mode))

    def test_markerV0_is_bit_exact_legacy(self, enc, setup):
        _, h, sidx = setup
        assert np.array_equal(
            enc.span_representations_mode(h, sidx, K, "markerV0"),
            enc.span_representations(h, sidx),
        )

    def test_modes_are_distinct(self, enc, setup):
        _, h, sidx = setup
        reps = {m: enc.span_representations_mode(h, sidx, K, m) for m in MODES}
        names = list(MODES)
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                assert not np.allclose(reps[names[i]], reps[names[j]]), (
                    names[i],
                    names[j],
                )

    def test_conv_mean_sum_window_semantics(self, enc, setup):
        # width-0 spans: the window holds one token, so sum == mean and
        # the reps coincide exactly; wider spans must differ (the tanh
        # squash keeps the kernel-size scale information).
        _, h, sidx = setup
        mean_g = enc.span_representations_mode(h, sidx, K, "conv_mean")
        sum_g = enc.span_representations_mode(h, sidx, K, "conv_sum")
        w0 = sidx[:, 1] == sidx[:, 0]
        assert np.allclose(mean_g[w0], sum_g[w0])
        wide = (sidx[:, 1] - sidx[:, 0] >= 2) & (sidx[:, 1] < len(h))
        assert not np.allclose(mean_g[wide], sum_g[wide])

    def test_conv_max_monotone_width(self, enc):
        # max-pooled pre-projection features grow monotonically with
        # width on nonnegative inputs
        h = np.abs(np.random.default_rng(3).standard_normal((8, 32)))
        pad = np.concatenate([h, np.zeros((K, 32))], axis=0)
        windows = np.stack([pad[k : k + 8] for k in range(K)], axis=1)
        acc = np.maximum.accumulate(windows, axis=1)
        assert (np.diff(acc, axis=1) >= 0).all()

    def test_unknown_and_token_level(self, enc, setup):
        _, h, sidx = setup
        with pytest.raises(ValueError, match="token"):
            enc.span_representations_mode(h, sidx, K, "token_level")
        with pytest.raises(ValueError, match="unknown span mode"):
            enc.span_representations_mode(h, sidx, K, "bert_pool")

    def test_empty_inputs(self, enc):
        assert enc.span_representations_mode(np.zeros((0, 32)), np.zeros((0, 2), dtype=int), K).shape == (0, 32)


class TestPipelineSpanModeSweep:
    @pytest.mark.parametrize("mode", MODES)
    def test_pipeline_runs_each_mode(self, mode):
        pipe = GLiNERPipeline(
            ["person", "place"],
            config=PipelineConfig(threshold=0.4, span_mode=mode, max_width=K),
        )
        ents = pipe.predict_entities(TEXT)
        for e in ents:
            assert TEXT[e["start"] : e["end"]] == e["text"]

    def test_default_mode_unchanged(self):
        base = GLiNERPipeline(
            ["person", "place"], config=PipelineConfig(threshold=0.4)
        ).predict_entities(TEXT)
        explicit = GLiNERPipeline(
            ["person", "place"],
            config=PipelineConfig(threshold=0.4, span_mode="markerV0"),
        ).predict_entities(TEXT)
        assert base == explicit
