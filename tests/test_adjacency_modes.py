"""Adjacency predictor modes (M11) — reference RelationsRepLayer parity
surface (relations_layers.py:315-406) + pair-building semantics
mirroring the reference's TestBuildEntityPairs cases (tests:555-576)."""

import numpy as np
import pytest

from gliner_spark.model.encoder import DeterministicEncoder
from gliner_spark.model.pipeline import GLiNERPipeline, PipelineConfig

MODES = ("bilinear", "dot", "mlp", "attention", "gcn", "gat")


@pytest.fixture(scope="module")
def reps():
    rng = np.random.default_rng(9)
    x = rng.standard_normal((6, 64))
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def enc():
    return DeterministicEncoder(dim=64, seed=42)


class TestAdjacencyProbs:
    @pytest.mark.parametrize("mode", MODES)
    def test_shape_range_determinism(self, enc, reps, mode):
        a = enc.adjacency_probs(reps, mode)
        assert a.shape == (6, 6)
        assert (a >= 0).all() and (a <= 1).all()
        assert np.array_equal(a, enc.adjacency_probs(reps, mode))

    def test_bilinear_matches_legacy_logits(self, enc, reps):
        legacy = 1.0 / (1.0 + np.exp(-enc.adjacency_logits(reps)))
        assert np.array_equal(enc.adjacency_probs(reps, "bilinear"), legacy)

    def test_attention_rows_sum_to_one(self, enc, reps):
        a = enc.adjacency_probs(reps, "attention")
        assert np.allclose(a.sum(axis=1), 1.0)

    def test_attn_alias(self, enc, reps):
        assert np.array_equal(
            enc.adjacency_probs(reps, "attn"), enc.adjacency_probs(reps, "attention")
        )

    def test_dot_symmetric_mlp_not(self, enc, reps):
        dot = enc.adjacency_probs(reps, "dot")
        assert np.allclose(dot, dot.T)
        mlp = enc.adjacency_probs(reps, "mlp")
        assert not np.allclose(mlp, mlp.T)  # directed pairs differ

    def test_modes_are_distinct(self, enc, reps):
        outs = [enc.adjacency_probs(reps, m) for m in MODES]
        for i in range(len(outs)):
            for j in range(i + 1, len(outs)):
                assert not np.allclose(outs[i], outs[j]), (MODES[i], MODES[j])

    def test_unknown_mode_raises(self, enc, reps):
        with pytest.raises(ValueError, match="relations mode"):
            enc.adjacency_probs(reps, "hypergraph")

    def test_empty_input(self, enc):
        assert enc.adjacency_probs(np.zeros((0, 64)), "gcn").shape == (0, 0)


class TestPipelineModeSweep:
    """Every mode drives the full relex head; default mode output is the
    exact pre-round-2 behavior (the hash-gated kg_triples path)."""

    TEXT = "maria runs the acme pipeline while jon reads the results table"

    def _pipe(self, mode):
        return GLiNERPipeline(
            ["person", "thing"],
            ["runs", "reads"],
            config=PipelineConfig(threshold=0.4, relations_mode=mode),
        )

    @pytest.mark.parametrize("mode", MODES)
    def test_mode_runs_end_to_end(self, mode):
        ents, rels = self._pipe(mode).predict_triples(self.TEXT)
        for r in rels:
            assert r["relation"] in ("runs", "reads")
            assert r["head"]["entity_idx"] != r["tail"]["entity_idx"]  # no diagonal
            for side in ("head", "tail"):
                s = r[side]
                assert self.TEXT[s["start"] : s["end"]] == s["text"]

    def test_default_equals_explicit_bilinear(self):
        default = GLiNERPipeline(
            ["person", "thing"], ["runs"], config=PipelineConfig(threshold=0.4)
        ).predict_triples(self.TEXT)
        explicit = self._pipe("bilinear")
        assert default == GLiNERPipeline(
            ["person", "thing"], ["runs"],
            config=PipelineConfig(threshold=0.4, relations_mode="bilinear"),
        ).predict_triples(self.TEXT)
        del explicit

    def test_both_directions_possible(self):
        # with a permissive threshold the directed grid includes (i, j)
        # and (j, i) — mirror of test_includes_both_directions (:576)
        pipe = self._pipe("dot")
        pipe.config.adjacency_threshold = 0.0
        pipe.config.relation_threshold = 0.0
        _, rels = pipe.predict_triples(self.TEXT, threshold=0.35)
        pairs = {(r["head"]["entity_idx"], r["tail"]["entity_idx"]) for r in rels}
        assert any((b, a) in pairs for (a, b) in pairs if a != b)
