"""KGE triple-plausibility scorers (M14).

The reference ships a family of knowledge-graph-embedding interaction
functions for scoring (head, relation, tail) triples
(gliner/modeling/multitask/triples_layers.py:24-754 — TransE, DistMult,
ComplEx, PairRE among others). Here the standard published interaction
formulas are implemented as batched numpy functions over (N, D)
embedding arrays, used two ways:

* inside extraction as an alternative pair×relation scorer, and
* as a post-hoc triple-plausibility ranker over an emitted triples
  table (``operators.kge_scores.score_triples``) — the typical
  KG-refinement pass that prunes implausible edges before graph
  materialization.

All arithmetic is fixed-order (sum over the trailing axis of
contiguous arrays) — deterministic per row regardless of batching.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np


def transe(h: np.ndarray, r: np.ndarray, t: np.ndarray) -> np.ndarray:
    """-||h + r - t||₂ (higher = more plausible)."""
    return -np.sqrt(((h + r - t) ** 2).sum(axis=-1))


def distmult(h: np.ndarray, r: np.ndarray, t: np.ndarray) -> np.ndarray:
    """<h, r, t> trilinear dot. Symmetric in (h, t) by construction."""
    return (h * r * t).sum(axis=-1)


def complex_(h: np.ndarray, r: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Re(<h, r, conj(t)>) with the first/second halves of each vector
    as real/imaginary parts. Asymmetric in (h, t)."""
    d = h.shape[-1] // 2
    hr, hi = h[..., :d], h[..., d:]
    rr, ri = r[..., :d], r[..., d:]
    tr, ti = t[..., :d], t[..., d:]
    return (
        (hr * rr * tr).sum(axis=-1)
        + (hi * rr * ti).sum(axis=-1)
        + (hr * ri * ti).sum(axis=-1)
        - (hi * ri * tr).sum(axis=-1)
    )


def pair_re(h: np.ndarray, r: np.ndarray, t: np.ndarray) -> np.ndarray:
    """-||h ∘ rᴴ − t ∘ rᵀ||₂ with the relation split into head/tail
    projectors (first/second halves)."""
    d = r.shape[-1] // 2
    return -np.sqrt(((h[..., :d] * r[..., :d] - t[..., :d] * r[..., d:]) ** 2).sum(axis=-1))


INTERACTIONS: Dict[str, Callable] = {
    "transe": transe,
    "distmult": distmult,
    "complex": complex_,
    "pair_re": pair_re,
}


def score_triples_np(
    h: np.ndarray, r: np.ndarray, t: np.ndarray, method: str = "transe"
) -> np.ndarray:
    fn = INTERACTIONS.get(method)
    if fn is None:
        raise ValueError(f"unknown KGE method {method!r}; have {sorted(INTERACTIONS)}")
    return fn(
        np.ascontiguousarray(h, dtype=np.float64),
        np.ascontiguousarray(r, dtype=np.float64),
        np.ascontiguousarray(t, dtype=np.float64),
    )
