"""KGE interaction functions (M14): algebraic laws + operator wiring."""

import numpy as np
import pytest

from gliner_spark.model.kge import (
    INTERACTIONS,
    complex_,
    distmult,
    pair_re,
    score_triples_np,
    transe,
)
from gliner_spark.operators.extract import extract_triples
from gliner_spark.operators.kge_scores import score_triples


@pytest.fixture(scope="module")
def hrt():
    rng = np.random.default_rng(3)
    return (
        rng.standard_normal((32, 16)),
        rng.standard_normal((32, 16)),
        rng.standard_normal((32, 16)),
    )


class TestInteractionLaws:
    def test_transe_perfect_translation_scores_zero(self, hrt):
        h, r, _ = hrt
        assert np.allclose(transe(h, r, h + r), 0.0)
        # and any perturbation strictly lowers the (non-positive) score
        assert (transe(h, r, h + r + 0.1) < 0).all()

    def test_distmult_symmetric_in_head_tail(self, hrt):
        h, r, t = hrt
        assert np.allclose(distmult(h, r, t), distmult(t, r, h))

    def test_complex_asymmetric_in_head_tail(self, hrt):
        h, r, t = hrt
        assert not np.allclose(complex_(h, r, t), complex_(t, r, h))

    def test_pair_re_zero_when_projections_match(self):
        rng = np.random.default_rng(5)
        h = rng.standard_normal((8, 16))
        r = np.concatenate([np.ones((8, 8)), np.ones((8, 8))], axis=1)
        # rH == rT == 1 → score 0 iff h[:8] == t[:8]
        t = h.copy()
        assert np.allclose(pair_re(h, r, t), 0.0)

    def test_registry_and_unknown_method(self, hrt):
        h, r, t = hrt
        for name in INTERACTIONS:
            assert score_triples_np(h, r, t, name).shape == (32,)
        with pytest.raises(ValueError):
            score_triples_np(h, r, t, "tucker")

    def test_batch_independence(self, hrt):
        """Per-row scores must not depend on batch composition (the
        Arrow-batch invariant)."""
        h, r, t = hrt
        full = score_triples_np(h, r, t, "complex")
        parts = np.concatenate(
            [score_triples_np(h[i : i + 5], r[i : i + 5], t[i : i + 5], "complex")
             for i in range(0, 32, 5)]
        )
        assert np.array_equal(full, parts)


class TestOperator:
    def test_appends_deterministic_scores(self, spark):
        pages = spark.createDataFrame(
            [("u0", "john smith works at acme corporation daily", "en")],
            "url string, text string, lang string",
        )
        triples = extract_triples(
            pages, ["person", "organization"], ["works_at"],
            gazetteer={"john smith": "person", "acme corporation": "organization"},
            patterns=[("person", "works_at", "organization")],
            scoring="gazetteer",
        )
        a = score_triples(triples, method="transe").collect()
        b = score_triples(triples, method="transe").collect()
        assert len(a) >= 1
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        assert all(r.kge_score <= 0 for r in a)  # TransE is a -distance
        c = {tuple(r)[:-1]: r.kge_score for r in score_triples(triples, "distmult").collect()}
        assert c  # different method runs end to end
