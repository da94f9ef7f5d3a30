"""Decode-kernel parity tests.

Mirrors the reference's decoder unit suites
(reference: tests/test_decoder.py — greedy overlap :795-849, threshold
filtering :91, flat/nested :135-159, token min-score :734, relex index
validation :528) re-expressed against our numpy kernels.
"""

import numpy as np
import pytest

from gliner_spark.kernel.decoding import (
    Span,
    decode_relations,
    decode_span_probs,
    decode_token_scores,
    greedy_search,
    has_overlapping,
    has_overlapping_nested,
    is_nested,
)


def logits_to_probs(logits):
    return 1.0 / (1.0 + np.exp(-np.asarray(logits, dtype=np.float64)))


class TestOverlapPredicates:
    def test_identical_position_depends_on_multilabel(self):
        assert has_overlapping((0, 2, "A"), (0, 2, "B"), multi_label=False)
        assert not has_overlapping((0, 2, "A"), (0, 2, "B"), multi_label=True)
        assert has_overlapping_nested((0, 2, "A"), (0, 2, "B"), multi_label=False)
        assert not has_overlapping_nested((0, 2, "A"), (0, 2, "B"), multi_label=True)

    def test_disjoint_never_overlaps(self):
        assert not has_overlapping((0, 1, "A"), (2, 3, "B"))
        assert not has_overlapping_nested((0, 1, "A"), (2, 3, "B"))

    def test_partial_overlap(self):
        assert has_overlapping((0, 2, "A"), (2, 4, "B"))
        assert has_overlapping_nested((0, 2, "A"), (2, 4, "B"))

    def test_nested_allowed_only_in_nested_mode(self):
        # (1,2) nested inside (0,5): flat kills it, nested mode allows it
        assert is_nested((0, 5), (1, 2))
        assert has_overlapping((0, 5, "A"), (1, 2, "B"))
        assert not has_overlapping_nested((0, 5, "A"), (1, 2, "B"))


class TestGreedySearch:
    def test_removes_lower_scoring_overlaps(self):
        spans = [
            Span(0, 2, "A", 0.9),
            Span(1, 3, "B", 0.8),  # overlaps the winner — dropped
            Span(5, 6, "C", 0.7),
        ]
        kept = greedy_search(spans, flat_ner=True)
        assert [(s.start, s.end) for s in kept] == [(0, 2), (5, 6)]

    def test_handles_nested_spans(self):
        spans = [Span(0, 5, "A", 0.9), Span(1, 2, "B", 0.8)]
        assert len(greedy_search(spans, flat_ner=True)) == 1
        kept = greedy_search(spans, flat_ner=False)
        assert [(s.start, s.end) for s in kept] == [(0, 5), (1, 2)]

    def test_multi_label_same_position(self):
        spans = [Span(0, 2, "A", 0.9), Span(0, 2, "B", 0.8)]
        assert len(greedy_search(spans, flat_ner=True, multi_label=False)) == 1
        kept = greedy_search(spans, flat_ner=True, multi_label=True)
        assert len(kept) == 2

    def test_tie_break_preserves_candidate_order(self):
        # Stable sort on -score: first-listed span wins the tie.
        spans = [Span(0, 2, "A", 0.8), Span(1, 3, "B", 0.8)]
        kept = greedy_search(spans, flat_ner=True)
        assert [(s.start, s.end, s.entity_type) for s in kept] == [(0, 2, "A")]

    def test_output_sorted_by_start(self):
        spans = [Span(6, 7, "A", 0.9), Span(0, 1, "B", 0.6), Span(3, 4, "C", 0.8)]
        kept = greedy_search(spans, flat_ner=True)
        assert [s.start for s in kept] == [0, 3, 6]


class TestSpanDecode:
    ID2C = {1: "person", 2: "org"}

    def _probs(self, L=4, K=3, C=2, fill=-5.0):
        return logits_to_probs(np.full((L, K, C), fill))

    def test_threshold_filtering(self):
        probs = self._probs()
        probs[0, 1, 0] = 0.95  # span (0,1) person
        probs[2, 0, 1] = 0.40  # below threshold
        tokens = ["a", "b", "c", "d"]
        spans = decode_span_probs(probs, tokens, self.ID2C, threshold=0.5)
        assert [(s.start, s.end, s.entity_type) for s in spans] == [(0, 1, "person")]
        assert spans[0].score == pytest.approx(0.95)

    def test_span_validity_filter(self):
        probs = self._probs()
        probs[3, 2, 0] = 0.99  # span (3,5) — runs past 4 tokens → invalid
        spans = decode_span_probs(probs, ["a", "b", "c", "d"], self.ID2C)
        assert spans == []

    def test_flat_ner_removes_overlaps(self):
        probs = self._probs()
        probs[0, 2, 0] = 0.9  # (0,2) person
        probs[1, 1, 1] = 0.8  # (1,2) org — overlaps
        spans = decode_span_probs(probs, list("abcd"), self.ID2C, flat_ner=True)
        assert [(s.start, s.end) for s in spans] == [(0, 2)]

    def test_nested_ner_keeps_contained(self):
        probs = self._probs()
        probs[0, 2, 0] = 0.9  # (0,2)
        probs[1, 0, 1] = 0.8  # (1,1) nested inside
        spans = decode_span_probs(probs, list("abcd"), self.ID2C, flat_ner=False)
        assert [(s.start, s.end) for s in spans] == [(0, 2), (1, 1)]

    def test_input_spans_restriction(self):
        probs = self._probs()
        probs[0, 1, 0] = 0.9
        probs[2, 1, 1] = 0.9
        spans = decode_span_probs(
            probs, list("abcd"), self.ID2C, input_spans=[(2, 3)]
        )
        assert [(s.start, s.end, s.entity_type) for s in spans] == [(2, 3, "org")]

    def test_return_class_probs_topk(self):
        probs = self._probs()
        probs[0, 0, 0] = 0.9
        probs[0, 0, 1] = 0.6
        spans = decode_span_probs(
            probs, list("abcd"), self.ID2C, return_class_probs=True
        )
        assert list(spans[0].class_probs) == ["person", "org"]


class TestTokenDecode:
    ID2C = {1: "person"}

    def test_span_score_is_minimum(self):
        W, C = 5, 1
        start = np.zeros((W, C))
        end = np.zeros((W, C))
        inside = np.zeros((W, C))
        start[1, 0] = 0.9
        end[3, 0] = 0.8
        inside[1:4, 0] = [0.95, 0.7, 0.85]
        spans = decode_token_scores(start, end, inside, self.ID2C, threshold=0.5)
        assert [(s.start, s.end) for s in spans] == [(1, 3)]
        assert spans[0].score == pytest.approx(0.7)  # min rule (decoder.py:1021)

    def test_validates_inside_scores(self):
        W, C = 5, 1
        start = np.zeros((W, C))
        end = np.zeros((W, C))
        inside = np.full((W, C), 0.9)
        start[0, 0] = 0.9
        end[2, 0] = 0.9
        inside[1, 0] = 0.3  # breaks the span
        assert decode_token_scores(start, end, inside, self.ID2C) == []

    def test_requires_same_class_and_order(self):
        W, C = 4, 2
        start = np.zeros((W, C))
        end = np.zeros((W, C))
        inside = np.full((W, C), 0.9)
        start[2, 0] = 0.9
        end[0, 1] = 0.9  # different class AND end < start
        assert decode_token_scores(start, end, inside, {1: "a", 2: "b"}) == []


class TestRelationDecode:
    R2C = {1: "works_at"}

    def test_basic_relation(self):
        spans = [Span(0, 1, "person", 0.9), Span(3, 4, "org", 0.8)]
        rel_idx = np.array([[0, 1]])
        rel_probs = np.array([[0.85]])
        rels = decode_relations(spans, rel_idx, rel_probs, None, self.R2C, 0.5)
        assert rels == [(0, "works_at", 1, pytest.approx(0.85))]

    def test_filters_invalid_indices(self):
        # Index-alignment quirk (decoder.py:822): indices past the
        # post-greedy list length are skipped.
        spans = [Span(0, 1, "person", 0.9)]
        rel_idx = np.array([[0, 1], [-1, 0], [0, 0]])
        rel_probs = np.array([[0.9], [0.9], [0.9]])
        rels = decode_relations(spans, rel_idx, rel_probs, None, self.R2C, 0.5)
        assert rels == [(0, "works_at", 0, pytest.approx(0.9))]

    def test_respects_relation_mask(self):
        spans = [Span(0, 1, "a", 0.9), Span(2, 3, "b", 0.9)]
        rel_idx = np.array([[0, 1], [1, 0]])
        rel_probs = np.array([[0.9], [0.9]])
        mask = np.array([False, True])
        rels = decode_relations(spans, rel_idx, rel_probs, mask, self.R2C, 0.5)
        assert rels == [(1, "works_at", 0, pytest.approx(0.9))]

    def test_unknown_class_id_skipped(self):
        spans = [Span(0, 1, "a", 0.9), Span(2, 3, "b", 0.9)]
        rel_idx = np.array([[0, 1]])
        rel_probs = np.array([[0.9, 0.9]])  # class 2 not in mapping
        rels = decode_relations(spans, rel_idx, rel_probs, None, self.R2C, 0.5)
        assert rels == [(0, "works_at", 1, pytest.approx(0.9))]
