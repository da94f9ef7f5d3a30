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
        # Adjacency-mode weights (relations_layers.py:315-406), drawn
        # AFTER every earlier weight so pre-round-2 scores stay
        # bit-identical. One set per mode that needs parameters.
        s = 1.0 / np.sqrt(dim)
        self.w_adj_mlp1 = rng.standard_normal((2 * dim, dim)) * np.sqrt(s)
        self.w_adj_mlp2 = rng.standard_normal((dim, 1)) * s
        self.w_adj_q = rng.standard_normal((dim, dim)) * s
        self.w_adj_k = rng.standard_normal((dim, dim)) * s
        self.w_adj_gcn = rng.standard_normal((dim, dim)) * s
        self.w_adj_gcn_proj = rng.standard_normal((dim, dim)) * s
        self.w_adj_gat = rng.standard_normal((dim, dim)) * s
        self._token_cache: Dict[str, np.ndarray] = {}
        # label_key → {(start_token, end_token) → (C,) score row}
        self._score_cache: Dict[str, Dict[tuple, np.ndarray]] = {}

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
        starts = np.clip(span_idx[:, 0], 0, L - 1).tolist()
        ends = np.clip(span_idx[:, 1], 0, L - 1).tolist()
        # Evict BEFORE computing `missing`: clearing after would drop the
        # keys this call just counted as hits and the fill loop below
        # would KeyError mid-task.
        if len(self._span_cache) > 2_000_000:  # bound executor memory
            self._span_cache.clear()
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
            for k, r in zip(missing, rep):
                self._span_cache[k] = r
        # fill a preallocated output instead of np.stack (which
        # expand_dims+concatenates row by row — profiler hotspot)
        out = np.empty((len(keys), self.dim))
        cache = self._span_cache
        for i, k in enumerate(keys):
            out[i] = cache[k]
        return out

    def rnn_smooth(self, token_embs: np.ndarray, num_layers: int = 1) -> np.ndarray:
        """M4 analog: bidirectional recurrent smoothing of word
        embeddings (LstmSeq2SeqEncoder, gliner/modeling/layers.py:9-64,
        wired when num_rnn_layers > 0, base.py:316-317).

        Deterministic simple-RNN cells replace the LSTM gates (the
        trained-weights-replaced-by-seeded-weights policy): per layer,
        h⃗ₜ = tanh(xₜW_i + h⃗ₜ₋₁W_h) forward and backward, concatenated
        and projected back to D, row-normalized. Sequential over L by
        nature (L ≤ max_len), vectorized over D.
        """
        D = self.dim
        h = token_embs
        L = h.shape[0]
        if L == 0:
            return h
        for layer in range(num_layers):
            wi_f = self._weight(f"rnn{layer}_wi_f", (D, D))
            wh_f = self._weight(f"rnn{layer}_wh_f", (D, D))
            wi_b = self._weight(f"rnn{layer}_wi_b", (D, D))
            wh_b = self._weight(f"rnn{layer}_wh_b", (D, D))
            w_out = self._weight(f"rnn{layer}_out", (2 * D, D))
            xi_f = _mm(h, wi_f)
            xi_b = _mm(h, wi_b)
            fwd = np.zeros((L, D))
            bwd = np.zeros((L, D))
            prev = np.zeros(D)
            for t in range(L):
                prev = np.tanh(xi_f[t] + _mm(prev[None, :], wh_f)[0])
                fwd[t] = prev
            prev = np.zeros(D)
            for t in range(L - 1, -1, -1):
                prev = np.tanh(xi_b[t] + _mm(prev[None, :], wh_b)[0])
                bwd[t] = prev
            h = np.tanh(_mm(np.concatenate([fwd, bwd], axis=1), w_out))
            h = h / (np.linalg.norm(h, axis=1, keepdims=True) + 1e-9)
        return h

    def cross_fuse(
        self, label_embs: np.ndarray, token_embs: np.ndarray, schema: str = "l2t-t2l"
    ) -> tuple:
        """M9 analog: CrossFuser label↔text attention
        (gliner/modeling/layers.py:298-404; wired via
        post_fusion_schema, base.py:239-247 — off by default in the
        reference and here).

        ``schema`` is the reference's dash-separated step list: each
        step ``q2kv`` updates the ``q`` state (``l`` = labels, ``t`` =
        text) by attending over the ``kv`` state with a residual +
        renormalize. Single-head deterministic attention.
        """
        states = {"l": label_embs, "t": token_embs}
        D = self.dim
        for i, step in enumerate(s for s in schema.split("-") if s):
            try:
                q_sym, kv_sym = step.split("2")
                q, kv = states[q_sym], states[kv_sym]
            except (ValueError, KeyError) as e:
                raise ValueError(
                    f"bad post_fusion_schema step {step!r} (want e.g. 'l2t-t2l')"
                ) from e
            if len(q) == 0 or len(kv) == 0:
                continue
            wq = self._weight(f"fuse{i}_q", (D, D))
            wk = self._weight(f"fuse{i}_k", (D, D))
            wv = self._weight(f"fuse{i}_v", (D, D))
            wo = self._weight(f"fuse{i}_o", (D, D))
            scores = _mm(_mm(q, wq), _mm(kv, wk).T) / np.sqrt(D)
            scores -= scores.max(axis=1, keepdims=True)
            attn = np.exp(scores)
            attn /= attn.sum(axis=1, keepdims=True)
            upd = np.tanh(_mm(_mm(attn, _mm(kv, wv)), wo))
            fused = q + upd  # residual
            states[q_sym] = fused / (np.linalg.norm(fused, axis=1, keepdims=True) + 1e-9)
        return states["l"], states["t"]

    SPAN_MODES = (
        "markerV0",
        "marker",
        "markerV1",
        "query",
        "mlp",
        "cat",
        "conv_conv",
        "conv_max",
        "conv_mean",
        "conv_sum",
        "conv_share",
    )

    def _weight(self, name: str, shape: tuple, fan_in: Optional[int] = None) -> np.ndarray:
        """Lazy hash-seeded weight (deterministic regardless of the
        order modes are first used; no draw-order hazard)."""
        if not hasattr(self, "_w_cache"):
            self._w_cache = {}
        key = (name, shape)
        w = self._w_cache.get(key)
        if w is None:
            g = np.random.default_rng(_hash_seed("wspan", str(self.seed), name, repr(shape)))
            w = g.standard_normal(shape) / np.sqrt(fan_in or shape[0])
            self._w_cache[key] = w
        return w

    def span_representations_mode(
        self,
        token_embs: np.ndarray,
        span_idx: np.ndarray,
        max_width: int,
        mode: str = "markerV0",
    ) -> np.ndarray:
        """(L, D) token embeddings + (S, 2) spans → (S, D) reps for every
        SpanRepLayer mode (gliner/modeling/span_rep.py:687-760 factory):

        * ``markerV0`` — the default production layer (:463-510), the
          bit-exact pre-round-2 path;
        * ``marker``/``markerV1`` — endpoint-projection MLPs, V1 adds
          the mean-token feature (:388-460, :513-585);
        * ``query``/``mlp``/``cat`` — per-(position, width) grids from
          learned width queries / a width-expanding MLP / concat with
          width queries (:8-155);
        * ``conv_*`` — width-k windows via conv/max/mean/sum pooling
          over right-zero-padded windows (:157-267), ``conv_share``
          shares one kernel across widths (:311-386).

        ``token_level`` (TokenMarker, :638-686) is realized as this
        build's token-scoring mode (PipelineConfig(mode="token")), not a
        span grid. Dropout layers are inference-identity and omitted.
        All outputs are row-normalized (consistent scoring scale).
        """
        L, D = token_embs.shape
        S = len(span_idx)
        if L == 0 or S == 0:
            return np.zeros((S, D))
        starts = np.clip(span_idx[:, 0], 0, L - 1)
        ends = np.clip(span_idx[:, 1], 0, L - 1)
        widths = np.clip(span_idx[:, 1] - span_idx[:, 0], 0, max_width - 1)
        relu = lambda x: np.maximum(x, 0.0)  # noqa: E731
        h = token_embs

        def norm(rep):
            return rep / (np.linalg.norm(rep, axis=-1, keepdims=True) + 1e-9)

        if mode == "markerV0":
            return self.span_representations(token_embs, span_idx)
        if mode == "marker":
            sr = _mm(relu(_mm(h, self._weight("marker_s1", (D, 2 * D)))), self._weight("marker_s2", (2 * D, D), 2 * D))
            er = _mm(relu(_mm(h, self._weight("marker_e1", (D, 2 * D)))), self._weight("marker_e2", (2 * D, D), 2 * D))
            cat = relu(np.concatenate([sr[starts], er[ends]], axis=1))
            return norm(_mm(cat, self._weight("marker_out", (2 * D, D))))
        if mode == "markerV1":
            sr = relu(_mm(h, self._weight("mk1_s", (D, D))))
            er = relu(_mm(h, self._weight("mk1_e", (D, D))))
            avg = relu(_mm(h.mean(axis=0)[None, :], self._weight("mk1_f", (D, D))))[0]
            cat = relu(
                np.concatenate(
                    [sr[starts], er[ends], np.broadcast_to(avg, (S, D))], axis=1
                )
            )
            return norm(_mm(cat, self._weight("mk1_out", (3 * D, D))))
        if mode == "query":
            q = self._weight("query_seg", (D, max_width), 1)  # uniform-ish scale
            grid = np.einsum("ld,dk->lkd", h, q, optimize=False)
            grid = relu(np.einsum("lkd,de->lke", grid, self._weight("query_proj", (D, D)), optimize=False))
            return norm(grid[starts, widths])
        if mode == "mlp":
            grid = relu(_mm(h, self._weight("mlp_w", (D, max_width * D)))).reshape(L, max_width, D)
            return norm(grid[starts, widths])
        if mode == "cat":
            qdim = min(D, 128)
            q = self._weight("cat_q", (qdim, max_width), 1)
            hi = h[starts]
            qs = q.T[widths]  # (S, qdim)
            cat = np.concatenate([hi, qs], axis=1)
            return norm(relu(_mm(cat, self._weight("cat_proj", (D + qdim, D)))))
        if mode in ("conv_conv", "conv_max", "conv_mean", "conv_sum", "conv_share"):
            pad = np.concatenate([h, np.zeros((max_width, D))], axis=0)
            grid = np.zeros((L, max_width, D))
            if mode == "conv_share":
                w = self._weight("conv_share_w", (max_width, D, D))
                for k in range(max_width):
                    acc = np.zeros((L, D))
                    for tau in range(k + 1):
                        acc += _mm(pad[tau : tau + L], w[tau])
                    grid[:, k] = acc
            elif mode == "conv_conv":
                # width 1 = identity; kernels 2..K are learned convs
                grid[:, 0] = h
                for k in range(1, max_width):
                    w = self._weight(f"conv_k{k + 1}", (k + 1, D, D))
                    acc = np.zeros((L, D))
                    for tau in range(k + 1):
                        acc += _mm(pad[tau : tau + L], w[tau])
                    grid[:, k] = acc
            else:
                windows = np.stack(
                    [pad[k : k + L] for k in range(max_width)], axis=1
                )  # (L, K, D) — window position k of each width
                csum = np.cumsum(windows, axis=1)
                counts = np.arange(1, max_width + 1)[None, :, None]
                if mode == "conv_mean":
                    grid = csum / counts
                elif mode == "conv_sum":
                    grid = csum
                else:  # conv_max
                    grid = np.maximum.accumulate(windows, axis=1)
            # project = Sequential(ReLU, Linear) (span_rep.py:247, :345);
            # the tanh squash (as in markerV0) keeps scores bounded AND
            # scale-sensitive — without it row normalization would make
            # conv_sum (= kernel_size × conv_mean) indistinguishable
            # from conv_mean, unlike the reference where the raw scale
            # flows into the logits.
            proj = self._weight("conv_proj", (D, D))
            grid = np.tanh(np.einsum("lkd,de->lke", relu(grid), proj, optimize=False))
            return norm(grid[starts, widths])
        if mode == "token_level":
            raise ValueError(
                "token_level span representation is the token-scoring model "
                "family here — use PipelineConfig(mode='token')"
            )
        raise ValueError(f"unknown span mode {mode!r}; have {self.SPAN_MODES}")

    def score_spans(self, span_reps: np.ndarray, label_embs: np.ndarray) -> np.ndarray:
        """(S, D) × (C, D) → (S, C) logits; the M6 einsum 'join'."""
        return (_mm(span_reps, label_embs.T) - self.margin) / self.temperature

    def score_spans_tokens(
        self,
        tokens: Sequence[str],
        span_idx: np.ndarray,
        label_embs: np.ndarray,
        label_key: str,
    ) -> np.ndarray:
        """Span×label logits with a cross-document cache keyed by
        (label set, start token, end token) — the span-rep cache
        extended one stage: a hit skips the rep gather AND the score
        einsum. Bit-identical to
        ``score_spans(span_representations_tokens(...))`` — each einsum
        row is an independent fixed-order reduction, so caching cannot
        change values. ``label_key`` must uniquely identify the label
        embedding set (the encoder singleton is shared across pipelines
        with different label sets, e.g. prompt-mode relex)."""
        L = len(tokens)
        C = label_embs.shape[0]
        if L == 0:
            return np.zeros((len(span_idx), C))
        # .tolist(): indexing a list with python ints is ~2× indexing
        # with numpy scalars (each np.int64 subscript pays __index__);
        # this loop runs L·K times per document.
        starts = np.clip(span_idx[:, 0], 0, L - 1).tolist()
        ends = np.clip(span_idx[:, 1], 0, L - 1).tolist()
        # two-level cache: one sub-dict per label set, so the hot keys
        # are plain (start_token, end_token) pairs instead of 3-tuples
        # re-hashing the label_key string on every lookup.
        cache = self._score_cache.get(label_key)
        if cache is None:
            # bound the NUMBER of label-set sub-caches too: each
            # distinct label set (incl. per-digest keys salted in by
            # predict_with_embeds) adds a sub-cache of up to 2M rows
            # on a long-lived executor singleton — without a top-level
            # cap the global memory bound doesn't hold. FIFO-evict the
            # oldest label keys (dict preserves insertion order).
            while len(self._score_cache) >= 32:
                self._score_cache.pop(next(iter(self._score_cache)))
            cache = self._score_cache.setdefault(label_key, {})
        # Evict BEFORE computing `missing` (same hazard as
        # span_representations_tokens: a post-hoc clear would evict this
        # call's cache hits and KeyError in the fill loop).
        if len(cache) > 2_000_000:  # bound executor memory
            cache.clear()
        keys = [(tokens[s], tokens[e]) for s, e in zip(starts, ends)]
        # single pass: fill hits immediately, collect miss positions —
        # halves the dict traffic vs (dedup-scan + second fill pass)
        out = np.empty((len(keys), C))
        miss_pos: Dict[tuple, list] = {}
        get = cache.get
        for i, k in enumerate(keys):
            row = get(k)
            if row is None:
                miss_pos.setdefault(k, []).append(i)
            else:
                out[i] = row
        if miss_pos:
            missing = list(miss_pos)
            cat = np.concatenate(
                [
                    np.stack([self.token_embedding(a) for a, _b in missing]),
                    np.stack([self.token_embedding(b) for _a, b in missing]),
                ],
                axis=1,
            )
            rep = np.tanh(_mm(cat, self.w_span))
            rep /= np.linalg.norm(rep, axis=1, keepdims=True) + 1e-9
            rows = (_mm(rep, label_embs.T) - self.margin) / self.temperature
            for k, r in zip(missing, rows):
                cache[k] = r
                for i in miss_pos[k]:
                    out[i] = r
        return out

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

    ADJACENCY_MODES = ("bilinear", "dot", "mlp", "attention", "attn", "gcn", "gat")

    def adjacency_probs(self, span_reps: np.ndarray, mode: str = "bilinear") -> np.ndarray:
        """(E, D) → (E, E) adjacency PROBABILITIES for every
        RelationsRepLayer mode (relations_layers.py:315-406):

        * ``bilinear`` — sigmoid of the bit-exact pre-round-2 logits
          (BilinearDecoder, :150-185);
        * ``dot`` — sigmoid(X·Xᵀ) (dot_product_adjacency, :45-71);
        * ``mlp`` — sigmoid(MLP([xᵢ ‖ xⱼ])) over all pairs (MLPDecoder,
          :73-108), vectorized over the E×E grid instead of the
          reference's expand/cat;
        * ``attention``/``attn`` — single-head self-attention weights
          softmax((XW_q)(XW_k)ᵀ/√D) (AttentionAdjacency, :110-148 —
          already in [0,1], rows sum to 1);
        * ``gcn`` — dot adjacency → symmetric-normalized propagation →
          ReLU(linear) → sigmoid(ZZᵀ) (GCNDecoder, :186-269);
        * ``gat`` — attention-weighted context → linear → sigmoid(ZZᵀ)
          (GATDecoder, :272-312).
        """
        m = mode.lower()
        E, D = span_reps.shape
        if E == 0:
            return np.zeros((0, 0))
        logistic = lambda x: 1.0 / (1.0 + np.exp(-x))  # noqa: E731
        scale = lambda x: (x - self.margin) / self.temperature  # noqa: E731
        if m == "bilinear":
            return logistic(self.adjacency_logits(span_reps))
        if m == "dot":
            return logistic(scale(_mm(span_reps, span_reps.T)))
        if m == "mlp":
            xi = np.repeat(span_reps, E, axis=0)  # row-major (i, j) grid
            xj = np.tile(span_reps, (E, 1))
            hid = np.maximum(_mm(np.concatenate([xi, xj], axis=1), self.w_adj_mlp1), 0.0)
            return logistic(scale(_mm(hid, self.w_adj_mlp2)).reshape(E, E))
        if m in ("attention", "attn"):
            q = _mm(span_reps, self.w_adj_q)
            k = _mm(span_reps, self.w_adj_k)
            scores = _mm(q, k.T) / np.sqrt(D)
            scores = scores - scores.max(axis=1, keepdims=True)
            w = np.exp(scores)
            return w / w.sum(axis=1, keepdims=True)
        if m == "gcn":
            a0 = logistic(scale(_mm(span_reps, span_reps.T)))
            a0 = a0 + np.eye(E)  # self-loops (SimpleGCNLayer, :222-227)
            d_inv_sqrt = 1.0 / np.sqrt(a0.sum(axis=1))
            a_norm = a0 * d_inv_sqrt[:, None] * d_inv_sqrt[None, :]
            hidden = np.maximum(_mm(_mm(a_norm, span_reps), self.w_adj_gcn), 0.0)
            z = _mm(hidden, self.w_adj_gcn_proj)
            return logistic(scale(_mm(z, z.T)))
        if m == "gat":
            w = self.adjacency_probs(span_reps, "attention")
            z = _mm(_mm(w, span_reps), self.w_adj_gat)
            return logistic(scale(_mm(z, z.T)))
        raise ValueError(
            f"unknown relations mode {mode!r}; have {self.ADJACENCY_MODES}"
        )

    def pair_relation_logits(
        self, head_reps: np.ndarray, tail_reps: np.ndarray, rel_embs: np.ndarray
    ) -> np.ndarray:
        """(N, D) pairs × (R, D) relation embeds → (N, R) logits (base.py:2243-2258)."""
        if len(head_reps) == 0:
            return np.zeros((0, len(rel_embs)))
        pair = np.tanh(_mm(np.concatenate([head_reps, tail_reps], axis=1), self.w_pair))
        pair /= np.linalg.norm(pair, axis=1, keepdims=True) + 1e-9
        return (_mm(pair, rel_embs.T) - self.margin) / self.temperature

    def pair_relation_logits_packed(
        self, packed_reps: np.ndarray, pairs: np.ndarray, rel_embs: np.ndarray
    ) -> np.ndarray:
        """Same scorer, factored for the E ≪ N structure of the pair
        grid: [h ‖ t] @ W = h @ W_top + t @ W_bot, so the two D×D
        projections run ONCE per packed span (E rows) and each of the N
        pairs is a vector add + tanh instead of a 2D-wide matmul row.
        ~8× less matmul work when N ≈ E² (the hot path the profiler
        flagged). Gazetteer-mode zero reps produce exactly 0 either
        way, so the hash-gated queries are unchanged; nonzero paths may
        differ from the concat form in the last ulp (different
        summation grouping) — both forms are fixed-order and therefore
        cross-process deterministic, which is the real contract."""
        if len(pairs) == 0:
            return np.zeros((0, len(rel_embs)))
        D = self.dim
        proj_h = _mm(packed_reps, self.w_pair[:D])  # (E, D)
        proj_t = _mm(packed_reps, self.w_pair[D:])  # (E, D)
        pair = np.tanh(proj_h[pairs[:, 0]] + proj_t[pairs[:, 1]])
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
