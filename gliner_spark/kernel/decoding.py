"""Decoding: probabilities → entity spans and relations.

Pure numpy/Python re-implementation of the reference decoders with
identical decision semantics:

- overlap predicates      → gliner/decoding/utils.py:1-19
- greedy overlap search   → gliner/decoding/decoder.py:74-116
- span decode (L,K,C)     → decoder.py:127-157, 222-293, 295-355
- token decode (W,C,3)    → decoder.py:961-1028 (min-score rule :1021)
- relation decode         → decoder.py:743-843 (index-alignment quirk :822)

Parity-critical details preserved:
* candidate generation order is the row-major scan order of
  ``torch.where(probs > threshold)`` (decoder.py:271);
* greedy sort is a stable sort on ``-score`` (decoder.py:99), so ties
  break in candidate order; final output is stably re-sorted by start
  (decoder.py:115);
* span validity is ``start + width + 1 <= len(tokens)``
  (decoder.py:144-157);
* relation head/tail indices are validated against the POST-greedy span
  list even though they were produced pre-greedy (decoder.py:822) — this
  index-alignment quirk shapes which triples survive and is ported
  verbatim.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


@dataclass(slots=True)
class Span:
    """Detected entity span. Mirrors decoder.py:11-28 (word-level, end inclusive)."""

    start: int
    end: int
    entity_type: str
    score: float
    class_probs: Optional[Dict[str, float]] = None
    # generative families only (SpanGenerativeDecoder._build_span_tuple,
    # decoder.py:492-530): the LM-generated type strings for this span
    generated_labels: Optional[List[str]] = None


def sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def is_nested(idx1, idx2) -> bool:
    """True if one span contains the other (decoding/utils.py:1-3)."""
    return (idx1[0] <= idx2[0] and idx1[1] >= idx2[1]) or (
        idx2[0] <= idx1[0] and idx2[1] >= idx1[1]
    )


def has_overlapping(idx1, idx2, multi_label: bool = False) -> bool:
    """Any-overlap predicate for flat NER (decoding/utils.py:6-11)."""
    if idx1[:2] == idx2[:2]:
        return not multi_label
    return not (idx1[0] > idx2[1] or idx2[0] > idx1[1])


def has_overlapping_nested(idx1, idx2, multi_label: bool = False) -> bool:
    """Overlap-but-not-nested predicate for nested NER (utils.py:14-19)."""
    if idx1[:2] == idx2[:2]:
        return not multi_label
    return not ((idx1[0] > idx2[1] or idx2[0] > idx1[1]) or is_nested(idx1, idx2))


def greedy_search(
    spans: List[Span], flat_ner: bool = True, multi_label: bool = False
) -> List[Span]:
    """Greedy overlap resolution (decoder.py:74-116).

    Stable sort by score desc; keep a span iff it doesn't overlap any
    already-kept span; stably re-sort kept spans by start.

    The acceptance loop is inherently sequential, but the overlap test
    of one candidate against the whole kept set is vectorized — exact
    boolean-for-boolean port of has_overlapping /
    has_overlapping_nested (differential-tested against the reference's
    own greedy_search in tests/test_reference_parity.py).
    """
    if flat_ner and not multi_label:
        # fast path for the default mode: with flat NER and single
        # labels, "conflicts with any kept span" ⟺ "any token position
        # in [start, end] is already covered" (kept spans are disjoint
        # and identical spans cover their own positions), so one
        # coverage array replaces the per-candidate kept-set scan.
        # Decision-identical to the general path: same stable sort, same
        # acceptance predicate. bytearray.find is a no-copy C memchr —
        # 3.7× the numpy slice+any() for the short spans this sees
        # (each candidate paid ~2µs of ndarray-slice overhead).
        if not spans:
            return []
        covered = bytearray(max(s.end for s in spans) + 1)
        kept = []
        for span in sorted(spans, key=lambda x: -x.score):
            hi = span.end + 1
            if covered.find(1, span.start, hi) >= 0:
                continue
            covered[span.start : hi] = b"\x01" * (hi - span.start)
            kept.append(span)
        return sorted(kept, key=lambda x: x.start)
    kept: List[Span] = []
    n = len(spans)
    # preallocated kept-endpoint arrays: the overlap check against the
    # whole kept set stays vectorized WITHOUT a list→array conversion
    # per candidate (the profiler's top per-call overhead)
    ks = np.empty(n, dtype=np.int64)
    ke = np.empty(n, dtype=np.int64)
    cnt = 0
    for span in sorted(spans, key=lambda x: -x.score):
        if cnt:
            a_s = ks[:cnt]
            a_e = ke[:cnt]
            same = (a_s == span.start) & (a_e == span.end)
            iv = ~((span.start > a_e) | (a_s > span.end))
            if not flat_ner:
                nested = ((a_s <= span.start) & (a_e >= span.end)) | (
                    (span.start <= a_s) & (span.end >= a_e)
                )
                iv = iv & ~nested
            conflict = np.where(same, not multi_label, iv)
            if conflict.any():
                continue
        kept.append(span)
        ks[cnt] = span.start
        ke[cnt] = span.end
        cnt += 1
    return sorted(kept, key=lambda x: x.start)


def _top_k_class_probs(
    probs_c: np.ndarray, id_to_class: Dict[int, str], k: int = 5
) -> Dict[str, float]:
    """Top-k class probabilities for one span (decoder.py:159-188)."""
    k = min(k, probs_c.shape[0])
    top = np.argsort(-probs_c, kind="stable")[:k]
    return {
        id_to_class.get(int(i) + 1, f"class_{int(i)}"): float(probs_c[i]) for i in top
    }


def decode_span_probs(
    probs: np.ndarray,
    tokens: Sequence[str],
    id_to_class: Dict[int, str],
    threshold: float = 0.5,
    flat_ner: bool = True,
    multi_label: bool = False,
    return_class_probs: bool = False,
    input_spans: Optional[List[Tuple[int, int]]] = None,
) -> List[Span]:
    """Decode one sample's (L, K, C) probability tensor into spans.

    Mirrors ``_decode_batch_item`` (decoder.py:222-293). ``probs`` must
    already be sigmoided. Candidate order = np.argwhere row-major order,
    identical to torch.where's.
    """
    L, K, _C = probs.shape

    if input_spans is not None:
        mask = np.zeros((L, K), dtype=bool)
        for ws, we in input_spans:
            width = we - ws
            if 0 <= width < K and 0 <= ws < L:
                mask[ws, width] = True
        probs = probs * mask[:, :, None]

    n_tokens = len(tokens)
    out: List[Span] = []
    for s, k, c in np.argwhere(probs > threshold):
        if s + k + 1 > n_tokens:  # _is_valid_span, decoder.py:144-157
            continue
        score = float(probs[s, k, c])
        cp = (
            _top_k_class_probs(probs[s, k, :], id_to_class) if return_class_probs else None
        )
        out.append(
            Span(
                start=int(s),
                end=int(s + k),
                entity_type=id_to_class[int(c) + 1],
                score=score,
                class_probs=cp,
            )
        )
    return greedy_search(out, flat_ner, multi_label=multi_label)


def decode_token_scores(
    start_scores: np.ndarray,
    end_scores: np.ndarray,
    inside_scores: np.ndarray,
    id_to_class: Dict[int, str],
    threshold: float = 0.5,
    flat_ner: bool = True,
    multi_label: bool = False,
    input_spans: Optional[List[Tuple[int, int]]] = None,
    return_class_probs: bool = False,
) -> List[Span]:
    """Token-mode decode for one sample: (W, C) start/end/inside probs.

    Mirrors TokenDecoder._calculate_span_score (decoder.py:975-1028):
    match same-class (start, end) pairs with end >= start; require every
    inside score within the span > threshold; span score = min(inside ∪
    {start_score, end_score}) (decoder.py:1021). Inputs are probabilities
    (already sigmoided), matching _get_indices_above_threshold
    (decoder.py:961-973).

    ``return_class_probs`` attaches the top-k per-class min-rule scores
    — min(inside[st:ed+1, c] ∪ {start[st, c], end[ed, c]}) for every
    class c — the token-mode analog of the span decoder's D4 top-k
    (decoder.py:159-188; the reference's TokenDecoder itself has no
    class-probs path, so this is an additive, uniform extension).
    """
    spans: List[Span] = []
    input_set = set(input_spans) if input_spans is not None else None
    start_idx = np.argwhere(start_scores > threshold)
    end_idx = np.argwhere(end_scores > threshold)
    for st, cls_st in start_idx:
        for ed, cls_ed in end_idx:
            if ed >= st and cls_st == cls_ed:
                if input_set is not None and (int(st), int(ed)) not in input_set:
                    continue
                ins = inside_scores[st : ed + 1, cls_st]
                if (ins < threshold).any():
                    continue
                score = float(
                    min(ins.min(), start_scores[st, cls_st], end_scores[ed, cls_ed])
                )
                cp = None
                if return_class_probs:
                    per_class = np.minimum(
                        inside_scores[st : ed + 1, :].min(axis=0),
                        np.minimum(start_scores[st, :], end_scores[ed, :]),
                    )
                    cp = _top_k_class_probs(per_class, id_to_class)
                spans.append(
                    Span(
                        start=int(st),
                        end=int(ed),
                        entity_type=id_to_class[int(cls_st) + 1],
                        score=score,
                        class_probs=cp,
                    )
                )
    return greedy_search(spans, flat_ner, multi_label=multi_label)


def extract_spans_from_token_probs(
    start_probs: np.ndarray,
    end_probs: np.ndarray,
    inside_probs: np.ndarray,
    threshold: float = 0.5,
) -> np.ndarray:
    """Candidate (start, end) spans from BIO-flag probabilities — the
    model-side span PROPOSAL stage of the token-relex family
    (extract_spans_from_tokens, modeling/utils.py:299-379, at B=1 with
    labels=None; inputs here are probabilities, the reference sigmoids
    logits first).

    Returns (N, 2) int64 in the reference's exact order: start flags
    enumerate in (position, class) row-major order; for each start, the
    matching end flags (same class, end >= start) in their own
    row-major order; a candidate survives only when EVERY inside
    position in [start, end] is flagged for that class (the cumsum
    check, utils.py:355-357). Identical (start, end) proposed by
    different classes stays duplicated — ``rel_idx`` indexes THIS list
    (represent_spans override, base.py:2497-2514), so order and
    multiplicity are part of the contract.
    """
    start_mask = start_probs > threshold
    end_mask = end_probs > threshold
    inside_mask = inside_probs > threshold
    starts = np.argwhere(start_mask)  # row-major (pos, cls)
    ends = np.argwhere(end_mask)
    if len(starts) == 0 or len(ends) == 0:
        return np.zeros((0, 2), dtype=np.int64)
    s_pos, s_cls = starts[:, 0], starts[:, 1]
    e_pos, e_cls = ends[:, 0], ends[:, 1]
    valid = (s_cls[:, None] == e_cls[None, :]) & (s_pos[:, None] <= e_pos[None, :])
    si, ei = np.nonzero(valid)  # si-major ≡ torch nonzero enumeration
    if len(si) == 0:
        return np.zeros((0, 2), dtype=np.int64)
    cs, ce, cc = s_pos[si], e_pos[ei], s_cls[si]
    W, C = inside_mask.shape
    csum = np.zeros((W + 1, C), dtype=np.int64)
    np.cumsum(inside_mask, axis=0, out=csum[1:])
    ok = (csum[ce + 1, cc] - csum[cs, cc]) == (ce - cs + 1)
    return np.stack([cs[ok], ce[ok]], axis=1).astype(np.int64)


def decode_candidate_span_probs(
    span_probs: np.ndarray,
    cand: np.ndarray,
    id_to_class: Dict[int, str],
    span_label_map: Optional[Dict[int, List[str]]] = None,
    threshold: float = 0.5,
    flat_ner: bool = True,
    multi_label: bool = False,
) -> List[Span]:
    """Decode a PACKED candidate list's (E, C) span probabilities —
    the token-generative family's final entity decode
    (TokenGenerativeDecoder.decode_generative, decoder.py:1438-1533).

    Unlike ``decode_token_scores`` (the plain token family's min-rule
    assembly), the token-DECODER family re-scores each token-proposed
    candidate span against the label embeddings and decodes from those
    span logits: candidates iterate in list order (the reference's
    ``valid_indices`` scan over ``span_mask`` — our ``cand`` list is
    already packed, so every position is valid), every class above
    ``threshold`` emits a tuple, the generated labels attach by
    CANDIDATE POSITION (``span_label_map_i.get(span_pos.item())``,
    decoder.py:1528 — position in the candidate list, NOT the L*K flat
    index the span-generative family uses), and ``greedy_search``
    resolves overlaps over the tuples WITH their gen labels already
    attached. Class ids absent from ``id_to_class`` are skipped
    (decoder.py:1524 ``if class_id in id_to_class_i``).

    ``span_probs`` must already be sigmoided; ``cand`` is the (E, 2)
    word-span array from ``extract_spans_from_token_probs``.
    """
    label_map = span_label_map or {}
    out: List[Span] = []
    for pos in range(len(cand)):
        s, e = int(cand[pos, 0]), int(cand[pos, 1])
        gen = label_map.get(pos)
        for c in np.nonzero(span_probs[pos] > threshold)[0]:
            entity_type = id_to_class.get(int(c) + 1)
            if entity_type is None:
                continue
            out.append(
                Span(
                    start=s,
                    end=e,
                    entity_type=entity_type,
                    score=float(span_probs[pos, c]),
                    generated_labels=gen,
                )
            )
    return greedy_search(out, flat_ner, multi_label=multi_label)


def decode_relations(
    spans: List[Span],
    rel_idx: Optional[np.ndarray],
    rel_probs: Optional[np.ndarray],
    rel_mask: Optional[np.ndarray],
    rel_id_to_class: Dict[int, str],
    threshold: float = 0.5,
) -> List[Tuple[int, str, int, float]]:
    """Decode one sample's relations (decoder.py:743-843).

    ``spans`` is the POST-greedy entity list; ``rel_idx`` (N, 2) holds
    head/tail indices produced PRE-greedy from the packed confident-span
    list — out-of-range indices are skipped (decoder.py:822), exactly as
    the reference does. ``rel_probs`` (N, C_rel) must be sigmoided.
    Emits (head_idx, rel_label, tail_idx, score) tuples in scan order.
    """
    relations: List[Tuple[int, str, int, float]] = []
    if rel_idx is None or rel_probs is None or len(rel_idx) == 0:
        return relations
    if rel_mask is None:
        rel_mask = np.ones(len(rel_idx), dtype=bool)

    # Vectorized emission in the reference's exact (pair, class) scan
    # order (row-major argwhere ≡ the nested loops of decoder.py:
    # 805-841): valid pair AND prob > threshold AND known class id.
    n_spans = len(spans)
    rel_idx = np.asarray(rel_idx)
    heads = rel_idx[:, 0]
    tails = rel_idx[:, 1]
    pair_ok = (
        np.asarray(rel_mask, dtype=bool)
        & (heads >= 0) & (tails >= 0)
        & (heads < n_spans) & (tails < n_spans)  # pruned-by-greedy semi-join
    )
    C = rel_probs.shape[1]
    class_ok = np.array([(c + 1) in rel_id_to_class for c in range(C)])
    emit = pair_ok[:, None] & (rel_probs > threshold) & class_ok[None, :]
    for j, c in np.argwhere(emit):
        relations.append(
            (
                int(heads[j]),
                rel_id_to_class[int(c) + 1],
                int(tails[j]),
                float(rel_probs[j, c]),
            )
        )
    return relations
