"""Span/label scoring backends.

The reference scores every candidate span against every label prompt via
``einsum("BLKD,BCD->BLKC", span_rep, prompts_embedding)``
(gliner/modeling/base.py:409) with span representations from the
markerV0 layer (gliner/modeling/span_rep.py:463-510: MLP(start) ‖
MLP(end) → MLP) and, in bi-encoder mode, label embeddings computed once
and reused for every text (gliner/model.py:1627-1656) — which in Spark
becomes a driver-side precompute + broadcast.

``DeterministicEncoder`` reproduces that dataflow with hash-seeded fixed
weights: every structural stage (token embedding → span representation →
span×label einsum → sigmoid) is present, only the learned weights are
replaced by deterministic pseudo-random ones. This keeps the full
pipeline testable and reproducible in environments without torch/ORT,
while the ONNX path drops in unchanged for production.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Optional, Sequence

import numpy as np

_U64 = np.float64(2**64)


def _mm(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Deterministic matrix multiply.

    ``a @ b`` dispatches to BLAS, whose reduction order (and therefore
    the low bits of every score) depends on the library's thread count —
    which differs between the Spark driver and executor python workers.
    Near-threshold spans then flip across processes and greedy overlap
    resolution (decoder.py:74-116) diverges. ``np.einsum`` with
    ``optimize=False`` never calls BLAS: fixed-order, single-threaded,
    bit-exact everywhere. The matrices on this path are small
    (≤ L·K×2D ≈ 4608×128), so the BLAS loss is irrelevant next to the
    cross-process-parity requirement (byte-identical output per url).
    """
    return np.einsum("ij,jk->ik", a, b, optimize=False)


def _hash_seed(*parts: str) -> int:
    """Stable cross-process 64-bit seed from strings (no Python hash())."""
    h = hashlib.blake2b("\x1f".join(parts).encode("utf-8"), digest_size=8)
    return int.from_bytes(h.digest(), "little")


class DeterministicEncoder:
    """Pure-numpy deterministic span-vs-label scorer.

    Mirrors the uni-encoder-span forward dataflow
    (gliner/modeling/base.py:353-423) minus learned weights:

    * token embedding  — unit vector seeded by blake2b(token)   [M1/M3]
    * label embedding  — mean of label-word vectors, normalized  [M8]
    * span rep         — [emb(start) ‖ emb(end)] @ W_span, tanh  [M5 markerV0]
    * span×label score — einsum('skd,cd->skc') / temperature     [M6]
    * adjacency        — bilinear head·A·tail                    [M11 dot-mode]
    * pair×relation    — [head ‖ tail] @ W_pair vs rel embeds    [M13]
    """

    def __init__(
        self,
        dim: int = 64,
        seed: int = 42,
        temperature: float = 0.15,
        margin: float = 0.25,
    ):
        # logits = (similarity - margin) / temperature. The margin keeps
        # positive predictions sparse (~1-2% of span×label pairs), like a
        # trained model — without it, sigmoid scores cluster at 0.5 and
        # the greedy decode degenerates to O(candidates²) over ~13% of
        # all spans.
        self.dim = dim
        self.seed = seed
        self.temperature = temperature
        self.margin = margin
        rng = np.random.default_rng(seed)
        # Fixed "weights" (the deterministic analog of trained parameters).
        self._span_cache: Dict[tuple, np.ndarray] = {}
        self.w_span = rng.standard_normal((2 * dim, dim)) / np.sqrt(2 * dim)
        self.w_adj = rng.standard_normal((dim, dim)) / np.sqrt(dim)
        self.w_pair = rng.standard_normal((2 * dim, dim)) / np.sqrt(2 * dim)
        # token-mode start/end/inside projections (drawn AFTER the span
        # weights so span-mode outputs stay bit-identical across
        # versions). The three channels are correlated perturbations of
        # one base — in a trained token model start/end/inside agree on
        # real entities, and fully independent random channels would
        # (unrealistically) almost never coincide above threshold.
        _tok_base = rng.standard_normal((dim, dim))
        self.w_tok = np.stack(
            [
                (_tok_base + 0.25 * rng.standard_normal((dim, dim)))
                / np.sqrt(dim)
                for _ in range(3)
            ]
        )
        self._token_cache: Dict[str, np.ndarray] = {}

    # ---- embeddings -----------------------------------------------------

    def token_embedding(self, token: str) -> np.ndarray:
        vec = self._token_cache.get(token)
        if vec is None:
            g = np.random.default_rng(_hash_seed("tok", str(self.seed), token))
            vec = g.standard_normal(self.dim)
            vec /= np.linalg.norm(vec) + 1e-9
            if len(self._token_cache) < 1_000_000:  # bound executor memory
                self._token_cache[token] = vec
        return vec

    def embed_tokens(self, tokens: Sequence[str]) -> np.ndarray:
        if not tokens:
            return np.zeros((0, self.dim))
        return np.stack([self.token_embedding(t) for t in tokens])

    def embed_labels(self, labels: Sequence[str]) -> np.ndarray:
        """Mean-pooled label embeddings (encoder.py:908-923 analog).

        Computed once per job and broadcast — the bi-encoder win the
        survey calls out (SURVEY.md §2.4 M8).
        """
        out = []
        for label in labels:
            words = [w for w in str(label).split() if w] or [str(label)]
            vec = np.mean([self.token_embedding(w) for w in words], axis=0)
            vec /= np.linalg.norm(vec) + 1e-9
            out.append(vec)
        return np.stack(out) if out else np.zeros((0, self.dim))

    # ---- span scoring ---------------------------------------------------

    def span_representations(
        self, token_embs: np.ndarray, span_idx: np.ndarray
    ) -> np.ndarray:
        """(S, 2) span indices → (S, D) markerV0-style reps.

        Invalid spans (end >= L) are clamped; validity is re-checked at
        decode time exactly like the reference (decoder.py:144-157).
        """
        L = token_embs.shape[0]
        starts = np.clip(span_idx[:, 0], 0, max(L - 1, 0))
        ends = np.clip(span_idx[:, 1], 0, max(L - 1, 0))
        if L == 0:
            return np.zeros((len(span_idx), self.dim))
        cat = np.concatenate([token_embs[starts], token_embs[ends]], axis=1)
        rep = np.tanh(_mm(cat, self.w_span))
        norm = np.linalg.norm(rep, axis=1, keepdims=True) + 1e-9
        return rep / norm

    def span_representations_tokens(
        self, tokens: Sequence[str], span_idx: np.ndarray
    ) -> np.ndarray:
        """Like :meth:`span_representations` but keyed by token STRINGS
        with a cross-document cache.

        A span rep depends only on (start_token, end_token); web-corpus
        vocabularies are Zipf-heavy, so most pairs repeat across
        documents and the tanh([e_s ‖ e_e] @ W) matmul is skipped for
        them. Bitwise identical to the uncached path: einsum computes
        each output row independently (fixed-order per-row reduction),
        so batch composition can't change the values.
        """
        L = len(tokens)
        if L == 0:
            return np.zeros((len(span_idx), self.dim))
        starts = np.clip(span_idx[:, 0], 0, L - 1)
        ends = np.clip(span_idx[:, 1], 0, L - 1)
        keys = [(tokens[s], tokens[e]) for s, e in zip(starts, ends)]
        missing = [k for k in dict.fromkeys(keys) if k not in self._span_cache]
        if missing:
            cat = np.concatenate(
                [
                    np.stack([self.token_embedding(a) for a, _ in missing]),
                    np.stack([self.token_embedding(b) for _, b in missing]),
                ],
                axis=1,
            )
            rep = np.tanh(_mm(cat, self.w_span))
            rep /= np.linalg.norm(rep, axis=1, keepdims=True) + 1e-9
            if len(self._span_cache) > 2_000_000:  # bound executor memory
                self._span_cache.clear()
            for k, r in zip(missing, rep):
                self._span_cache[k] = r
        return np.stack([self._span_cache[k] for k in keys])

    def score_spans(self, span_reps: np.ndarray, label_embs: np.ndarray) -> np.ndarray:
        """(S, D) × (C, D) → (S, C) logits; the M6 einsum 'join'."""
        return (_mm(span_reps, label_embs.T) - self.margin) / self.temperature

    def token_label_scores(
        self, token_embs: np.ndarray, label_embs: np.ndarray
    ) -> np.ndarray:
        """(W, D) × (C, D) → (W, C, 3) start/end/inside logits.

        The token-mode scorer (gliner/modeling/scorers.py:45-81: per-token
        bilinear+MLP against label prompts with 3 output channels) with
        deterministic weights; channel order [start, end, inside] matches
        the decoder contract (decoder.py:961-1028).
        """
        W = token_embs.shape[0]
        C = label_embs.shape[0]
        if W == 0 or C == 0:
            return np.zeros((W, C, 3))
        chans = []
        for i in range(3):
            proj = np.tanh(_mm(token_embs, self.w_tok[i]))
            proj /= np.linalg.norm(proj, axis=1, keepdims=True) + 1e-9
            chans.append((_mm(proj, label_embs.T) - self.margin) / self.temperature)
        return np.stack(chans, axis=-1)

    # ---- relation scoring -------------------------------------------------

    def adjacency_logits(self, span_reps: np.ndarray) -> np.ndarray:
        """(E, D) → (E, E) bilinear adjacency logits (relations_layers.py:45-70)."""
        proj = _mm(span_reps, self.w_adj)
        return (_mm(proj, span_reps.T) - self.margin) / self.temperature

    def pair_relation_logits(
        self, head_reps: np.ndarray, tail_reps: np.ndarray, rel_embs: np.ndarray
    ) -> np.ndarray:
        """(N, D) pairs × (R, D) relation embeds → (N, R) logits (base.py:2243-2258)."""
        if len(head_reps) == 0:
            return np.zeros((0, len(rel_embs)))
        pair = np.tanh(_mm(np.concatenate([head_reps, tail_reps], axis=1), self.w_pair))
        pair /= np.linalg.norm(pair, axis=1, keepdims=True) + 1e-9
        return (_mm(pair, rel_embs.T) - self.margin) / self.temperature


def __getattr__(name):
    """Back-compat: ``OnnxEncoder`` moved to model/onnx_backend.py as the
    code-complete :class:`OnnxSpanEncoder` (full feed construction +
    session.run + logits plumbing); lazy import avoids a cycle."""
    if name == "OnnxEncoder":
        from .onnx_backend import OnnxSpanEncoder

        return OnnxSpanEncoder
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


_ENCODER_SINGLETON: Optional[DeterministicEncoder] = None


def get_encoder(dim: int = 64, seed: int = 42) -> DeterministicEncoder:
    """Process-level encoder singleton (one per executor python worker).

    Mirrors the reference's single ``ort.InferenceSession``
    (gliner/model.py:682): initialize once, reuse for every batch.
    """
    global _ENCODER_SINGLETON
    if (
        _ENCODER_SINGLETON is None
        or _ENCODER_SINGLETON.dim != dim
        or _ENCODER_SINGLETON.seed != seed
    ):
        _ENCODER_SINGLETON = DeterministicEncoder(dim=dim, seed=seed)
    return _ENCODER_SINGLETON
