"""KGE triple-plausibility scorers (M14).

The reference ships a family of 17 knowledge-graph-embedding
interaction functions for scoring (head, relation, tail) triples
(gliner/modeling/multitask/triples_layers.py — factory at 557-664:
UM, SE, TransE, TransH, TransF, PairRE, TripleRE, DistMult, SimplE,
DistMA, ComplEx, QuatE, HolE, TuckER, ERMLP, ConvE, ConvKB). All are
implemented here as batched numpy functions over (N, D) embedding
arrays, used two ways:

* inside extraction as an alternative pair×relation scorer, and
* as a post-hoc triple-plausibility ranker over an emitted triples
  table (``operators.kge_scores.score_triples``) — the typical
  KG-refinement pass that prunes implausible edges before graph
  materialization.

Stateless interactions (pure algebra on h/r/t) are module functions;
interactions with learned parameters (TransH's hyperplane maps, the
TuckER core tensor, the conv filters, …) get hash-seeded deterministic
weights via :class:`StatefulKGE` — the same trained-weights-replaced-
by-seeded-weights policy as ``DeterministicEncoder``. Reference-
inference details intentionally simplified for the analog: BatchNorm
(TuckER) and dropout layers are identity at inference and are omitted.

All arithmetic is fixed-order (sums over the trailing axis of
contiguous arrays, einsum without BLAS dispatch) — deterministic per
row regardless of batching.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import numpy as np


def _np_mm(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Fixed-order matmul (no BLAS; see model/encoder._mm rationale)."""
    return np.einsum("...ij,jk->...ik", a, b, optimize=False)


def _clamp_neg_norm(x: np.ndarray, p: int = 2, clamp: float = 10.0) -> np.ndarray:
    """NormBasedInteraction._score (triples_layers.py:60-76):
    -min(||x||_p, clamp); higher = more plausible."""
    if p == 1:
        d = np.abs(x).sum(axis=-1)
    else:
        d = np.sqrt((x**2).sum(axis=-1))
    return -np.minimum(d, clamp)


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


def um(h: np.ndarray, r: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Unstructured model -||h - t|| (triples_layers.py:77-84)."""
    return _clamp_neg_norm(h - t)


def se(h: np.ndarray, r: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Structure Embedding: diag(r)·h - diag(r)·t = r ∘ (h - t)
    (triples_layers.py:87-101)."""
    return _clamp_neg_norm(r * (h - t))


def distma(h: np.ndarray, r: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Sum of pairwise dot products (triples_layers.py:317-321)."""
    return (h * r).sum(axis=-1) + (h * t).sum(axis=-1) + (r * t).sum(axis=-1)


def simple(h: np.ndarray, r: np.ndarray, t: np.ndarray) -> np.ndarray:
    """SimplE ½(⟨h_f, r_f, t_b⟩ + ⟨t_f, r_b, h_b⟩), forward/backward
    halves (triples_layers.py:241-259). Requires even dimension."""
    d = h.shape[-1]
    if d % 2:
        raise ValueError(f"SimplE requires even dimension, got {d}")
    d //= 2
    hf, hb = h[..., :d], h[..., d:]
    tf, tb = t[..., :d], t[..., d:]
    rf, rb = r[..., :d], r[..., d:]
    return 0.5 * ((hf * rf * tb).sum(axis=-1) + (tf * rb * hb).sum(axis=-1))


def quate(h: np.ndarray, r: np.ndarray, t: np.ndarray) -> np.ndarray:
    """QuatE Hamilton product (h ⨂ r) · t (triples_layers.py:342-362).
    Requires dimension divisible by 4."""
    d = h.shape[-1]
    if d % 4:
        raise ValueError(f"QuatE requires dimension divisible by 4, got {d}")
    q = d // 4
    h0, h1, h2, h3 = (h[..., i * q : (i + 1) * q] for i in range(4))
    r0, r1, r2, r3 = (r[..., i * q : (i + 1) * q] for i in range(4))
    t0, t1, t2, t3 = (t[..., i * q : (i + 1) * q] for i in range(4))
    a0 = h0 * r0 - h1 * r1 - h2 * r2 - h3 * r3
    a1 = h0 * r1 + h1 * r0 + h2 * r3 - h3 * r2
    a2 = h0 * r2 - h1 * r3 + h2 * r0 + h3 * r1
    a3 = h0 * r3 + h1 * r2 - h2 * r1 + h3 * r0
    return (a0 * t0 + a1 * t1 + a2 * t2 + a3 * t3).sum(axis=-1)


def hole(h: np.ndarray, r: np.ndarray, t: np.ndarray) -> np.ndarray:
    """HolE circular correlation ϕ(h, t) · r via rFFT
    (triples_layers.py:365-378). numpy's pocketfft is deterministic
    per-row (fixed radix plan for a given length)."""
    n = h.shape[-1]
    corr = np.fft.irfft(np.conj(np.fft.rfft(h, axis=-1)) * np.fft.rfft(t, axis=-1), n=n, axis=-1)
    return (corr * r).sum(axis=-1)


INTERACTIONS: Dict[str, Callable] = {
    "transe": transe,
    "distmult": distmult,
    "complex": complex_,
    "pair_re": pair_re,
    "um": um,
    "se": se,
    "distma": distma,
    "simple": simple,
    "quate": quate,
    "hole": hole,
}


class StatefulKGE:
    """Interactions with learned parameters, hash-seeded deterministic.

    Mirrors the parameterized interactions of triples_layers.py:
    TransH (114-141), TransF (144-183), TripleRE (206-231), TuckER
    (262-314), ERMLP (381-390), ConvKB (393-458, kernel_size=1),
    ConvE (461-555, 3×3 conv over the stacked h/r image). Weight draw
    order is fixed so adding methods never changes existing scores.
    """

    def __init__(self, dim: int, seed: int = 42, hidden: int = 128, n_filters: int = 8):
        self.dim = dim
        self.seed = seed
        self.hidden = hidden
        self.n_filters = n_filters
        rng = np.random.default_rng(np.random.SeedSequence([seed, dim, 0x4B47]))  # 'KG'
        s = 1.0 / np.sqrt(dim)
        # TransH: r → translation, r → hyperplane normal
        self.w_rtr = rng.standard_normal((dim, dim)) * s
        self.b_rtr = np.zeros(dim)
        self.w_w = rng.standard_normal((dim, dim)) * s
        self.b_w = np.zeros(dim)
        # TransF: initialized near plain TransE (ref init, :164-174)
        # with a small seeded perturbation so it is distinct.
        self.w_rvec = np.eye(dim) + 0.05 * rng.standard_normal((dim, dim)) * s
        self.w_alpha = 0.05 * rng.standard_normal((dim, dim)) * s
        self.b_alpha = np.ones(dim)
        self.w_beta = 0.05 * rng.standard_normal((dim, dim)) * s
        self.b_beta = np.ones(dim)
        # TripleRE
        self.w3_alpha = rng.standard_normal((dim, dim)) * s
        self.w3_beta = rng.standard_normal((dim, dim)) * s
        self.w3_delta = rng.standard_normal((dim, dim)) * s
        self.w3_gamma = rng.standard_normal((dim, 1)) * s
        self.b3_gamma = np.ones(1)
        # TuckER core tensor (d_r, d_e*d_e)
        self.tucker_w = rng.standard_normal((dim, dim * dim)) * s / np.sqrt(dim)
        # ERMLP
        self.ermlp_w1 = rng.standard_normal((3 * dim, hidden)) / np.sqrt(3 * dim)
        self.ermlp_b1 = np.zeros(hidden)
        self.ermlp_w2 = rng.standard_normal((hidden, 1)) / np.sqrt(hidden)
        # ConvKB (kernel_size=1 over 3 channels)
        self.convkb_w = rng.standard_normal((n_filters, 3)) / np.sqrt(3)
        self.convkb_b = np.zeros(n_filters)
        self.convkb_fc = rng.standard_normal((n_filters * dim, 1)) / np.sqrt(n_filters * dim)
        # ConvE: 3×3 conv over a (2·e1, e2) image of stacked h/r.
        # Pick the squarest factorization where both image sides fit
        # the kernel (ref requires dim % emb_dim1 == 0, :485).
        self.conve_k = 3
        candidates = [
            e1
            for e1 in range(1, dim + 1)
            if dim % e1 == 0 and 2 * e1 >= self.conve_k and dim // e1 >= self.conve_k
        ]
        if not candidates:
            raise ValueError(f"ConvE needs dim with a (e1, e2) factorization ≥ kernel; got {dim}")
        self.conve_e1 = min(candidates, key=lambda e1: abs(2 * e1 - dim // e1))
        self.conve_e2 = dim // self.conve_e1
        self.conve_filters = 4
        self.conve_w = rng.standard_normal((self.conve_filters, self.conve_k, self.conve_k)) / 3.0
        out_h = 2 * self.conve_e1 - self.conve_k + 1
        out_w = self.conve_e2 - self.conve_k + 1
        self.conve_fc = rng.standard_normal((self.conve_filters * out_h * out_w, dim)) / np.sqrt(
            max(self.conve_filters * out_h * out_w, 1)
        )

    # -- norm-based, relation-conditioned ------------------------------
    def transh(self, h, r, t):
        r_tr = _np_mm(r, self.w_rtr) + self.b_rtr
        w = _np_mm(r, self.w_w) + self.b_w
        w = w / (np.linalg.norm(w, axis=-1, keepdims=True) + 1e-12)
        proj = lambda x: x - (x * w).sum(axis=-1, keepdims=True) * w  # noqa: E731
        return _clamp_neg_norm(proj(h) + r_tr - proj(t))

    def transf(self, h, r, t):
        r_vec = _np_mm(r, self.w_rvec)
        alpha = _np_mm(r, self.w_alpha) + self.b_alpha
        beta = _np_mm(r, self.w_beta) + self.b_beta
        return _clamp_neg_norm(alpha * h + r_vec - beta * t)

    def triple_re(self, h, r, t):
        alpha = _np_mm(r, self.w3_alpha)
        beta = _np_mm(r, self.w3_beta)
        delta = _np_mm(r, self.w3_delta)
        gamma = (_np_mm(r, self.w3_gamma) + self.b3_gamma)[..., 0]
        return gamma * _clamp_neg_norm(alpha * h + delta - beta * t)

    # -- multiplicative / neural ---------------------------------------
    def tucker(self, h, r, t):
        # (N, D) @ (D, D*D) → per-row core slice; BN/dropout are
        # inference-identity and omitted (triples_layers.py:278-314).
        w_mat = _np_mm(r, self.tucker_w).reshape(*r.shape[:-1], self.dim, self.dim)
        hr = np.einsum("...d,...de->...e", h, w_mat, optimize=False)
        return (hr * t).sum(axis=-1)

    def ermlp(self, h, r, t):
        x = np.concatenate([h, r, t], axis=-1)
        hid = np.maximum(_np_mm(x, self.ermlp_w1) + self.ermlp_b1, 0.0)
        return _np_mm(hid, self.ermlp_w2)[..., 0]

    def convkb(self, h, r, t):
        stacked = np.stack([h, r, t], axis=-2)  # (N, 3, D)
        x = np.einsum("fc,...cd->...fd", self.convkb_w, stacked, optimize=False)
        x = np.maximum(x + self.convkb_b[..., :, None], 0.0)
        flat = x.reshape(*x.shape[:-2], self.n_filters * self.dim)
        return _np_mm(flat, self.convkb_fc)[..., 0]

    def conve(self, h, r, t):
        from numpy.lib.stride_tricks import sliding_window_view

        e1, e2, k = self.conve_e1, self.conve_e2, self.conve_k
        lead = h.shape[:-1]
        n = int(np.prod(lead)) if lead else 1
        img = np.concatenate(
            [h.reshape(n, e1, e2), r.reshape(n, e1, e2)], axis=1
        )  # (n, 2·e1, e2)
        win = sliding_window_view(img, (k, k), axis=(1, 2))  # (n, oh, ow, k, k)
        conv = np.einsum("nxykl,fkl->nfxy", win, self.conve_w, optimize=False)
        feat = np.maximum(conv, 0.0).reshape(n, -1)
        proj = np.maximum(_np_mm(feat, self.conve_fc), 0.0)  # (n, D)
        return (proj * t.reshape(n, self.dim)).sum(axis=-1).reshape(lead)


STATEFUL_METHODS = (
    "transh",
    "transf",
    "triple_re",
    "tucker",
    "ermlp",
    "convkb",
    "conve",
)

ALL_METHODS: Tuple[str, ...] = tuple(sorted(INTERACTIONS)) + STATEFUL_METHODS

_STATEFUL_CACHE: Dict[Tuple[int, int], StatefulKGE] = {}


def get_stateful(dim: int, seed: int = 42) -> StatefulKGE:
    key = (dim, seed)
    inst = _STATEFUL_CACHE.get(key)
    if inst is None:
        inst = _STATEFUL_CACHE[key] = StatefulKGE(dim, seed)
    return inst


def score_triples_np(
    h: np.ndarray,
    r: np.ndarray,
    t: np.ndarray,
    method: str = "transe",
    seed: int = 42,
) -> np.ndarray:
    h = np.ascontiguousarray(h, dtype=np.float64)
    r = np.ascontiguousarray(r, dtype=np.float64)
    t = np.ascontiguousarray(t, dtype=np.float64)
    fn: Optional[Callable] = INTERACTIONS.get(method)
    if fn is None and method in STATEFUL_METHODS:
        fn = getattr(get_stateful(h.shape[-1], seed), method)
    if fn is None:
        raise ValueError(f"unknown KGE method {method!r}; have {sorted(ALL_METHODS)}")
    return fn(h, r, t)
