"""Contract-faithful fake ORT sessions for the ONNX backend.

``FakeSpanSession`` implements, in numpy, the semantics of the exported
uni-encoder span graph (gliner/model.py:1875-1931 wrapper around
UniEncoderSpanModel.forward, gliner/modeling/base.py:353-423):

  embedding lookup over ``input_ids`` (M1 stand-in) →
  prompt-feature extraction at ``<<ENT>>`` positions (M2,
  modeling/utils.py:68-143) →
  first-subtoken word scatter via ``words_mask`` (M3,
  modeling/utils.py:6-65) →
  markerV0-style span reps over ``span_idx`` (M5, span_rep.py:463-510) →
  span×label einsum (M6, base.py:409) → ``logits (B, W, K, C)``.

``FakeRelexSession`` extends it with the relex tail (base.py:2134-2291):
confident-span selection (M10), bilinear adjacency (M11), directed pair
building (M12), pair×relation scoring against ``<<REL>>`` prompt
features (M13) → ``rel_idx/rel_logits/rel_mask``.

Because the fake *actually consumes* ``words_mask``/``span_idx``/
``attention_mask``, a feed-construction bug (wrong prompt skip, off-by-
one word ids, bad span padding) changes its logits — tests through this
fake exercise the real ONNX dataflow, not just shapes. Weights are
hash-seeded (no files); determinism matches DeterministicEncoder's
rules (fixed-order einsum, no BLAS).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from .encoder import _hash_seed, _mm
from .onnx_backend import (
    BIENCODER_SPAN_INPUT_NAMES,
    BIENCODER_TOKEN_INPUT_NAMES,
    RELEX_OUTPUT_NAMES,
    SPAN_INPUT_NAMES,
    SPAN_OUTPUT_NAMES,
    TOKEN_INPUT_NAMES,
)
from .subword import DeterministicSubwordTokenizer


class _NamedIO:
    def __init__(self, name: str):
        self.name = name


def fake_span_encoder_factory():
    """``encoder_factory`` for the extract operators: span-mode ONNX
    stack over the fake session (importable on Spark workers)."""
    from .onnx_backend import OnnxSpanEncoder

    return OnnxSpanEncoder(session=FakeSpanSession())


def fake_token_encoder_factory():
    from .onnx_backend import OnnxTokenEncoder

    return OnnxTokenEncoder(session=FakeTokenSession())


def fake_relex_encoder_factory():
    from .onnx_backend import OnnxRelexEncoder

    # Lower margin than the span fake: the relex tail multiplies three
    # sparse stages (entity > thr, adjacency > thr, relation > thr), so
    # a trained-model-like triple density needs a less conservative
    # score offset. A weight choice, not a semantics change.
    return OnnxRelexEncoder(session=FakeRelexSession(margin=0.12))


def fake_token_relex_encoder_factory():
    from .onnx_backend import OnnxTokenRelexEncoder

    # same margin rationale as the span relex fake
    return OnnxTokenRelexEncoder(session=FakeTokenRelexSession(margin=0.12))


class FakeSpanSession:
    """Drop-in for ``onnxruntime.InferenceSession`` (span spec)."""

    input_names: Sequence[str] = SPAN_INPUT_NAMES
    output_names: Sequence[str] = SPAN_OUTPUT_NAMES

    def __init__(
        self,
        dim: int = 64,
        seed: int = 42,
        temperature: float = 0.15,
        margin: float = 0.25,
        ent_token_id: int = DeterministicSubwordTokenizer.ENT_TOKEN_ID,
        rel_token_id: int = DeterministicSubwordTokenizer.REL_TOKEN_ID,
    ):
        self.dim = dim
        self.seed = seed
        self.temperature = temperature
        self.margin = margin
        self.ent_token_id = ent_token_id
        self.rel_token_id = rel_token_id
        rng = np.random.default_rng(seed)
        self.w_span = rng.standard_normal((2 * dim, dim)) / np.sqrt(2 * dim)
        self.w_adj = rng.standard_normal((dim, dim)) / np.sqrt(dim)
        self.w_pair = rng.standard_normal((2 * dim, dim)) / np.sqrt(2 * dim)
        self._id_cache: Dict[int, np.ndarray] = {}

    # -- session surface ----------------------------------------------
    def get_inputs(self):
        return [_NamedIO(n) for n in self.input_names]

    def get_outputs(self):
        return [_NamedIO(n) for n in self.output_names]

    def run(self, output_names, feed: Dict[str, np.ndarray]):
        state = self._encode(feed)
        return [self._span_logits(state)]

    # -- graph stages -------------------------------------------------
    def _id_embedding(self, token_id: int) -> np.ndarray:
        vec = self._id_cache.get(token_id)
        if vec is None:
            g = np.random.default_rng(_hash_seed("oid", str(self.seed), str(token_id)))
            vec = g.standard_normal(self.dim)
            vec /= np.linalg.norm(vec) + 1e-9
            self._id_cache[token_id] = vec
        return vec

    def _encode(self, feed: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        input_ids = np.asarray(feed["input_ids"])
        attention = np.asarray(feed["attention_mask"])
        words_mask = np.asarray(feed["words_mask"])
        text_lengths = np.asarray(feed["text_lengths"]).reshape(-1)
        # token-mode graphs declare no span grid (the feed filter drops it)
        span_idx = np.asarray(
            feed.get("span_idx", np.zeros((input_ids.shape[0], 0, 2), dtype=np.int64))
        )
        B, S = input_ids.shape
        D = self.dim
        # M1 stand-in: per-id embedding (vectorized: one lookup per
        # DISTINCT id, then a gather), zeroed where attention == 0.
        uniq, inv = np.unique(input_ids, return_inverse=True)
        table = np.stack([self._id_embedding(int(u)) for u in uniq])
        emb = table[inv.reshape(B, S)] * attention[:, :, None]
        # M2: label prompt features at <<ENT>> positions (same count per
        # row — every row shares the prompt).
        ent_pos = [np.nonzero(input_ids[b] == self.ent_token_id)[0] for b in range(B)]
        C = len(ent_pos[0]) if B else 0
        prompts = np.zeros((B, C, D))
        for b in range(B):
            # embedding of the label's FIRST subtoken (the reference
            # gathers the <<ENT>> marker embedding; a contextual encoder
            # mixes the label into it — here the marker embedding is
            # identical across labels, so blend in the next position)
            for c, p in enumerate(ent_pos[b]):
                nxt = emb[b, p + 1] if p + 1 < S else 0.0
                v = emb[b, p] + nxt
                prompts[b, c] = v / (np.linalg.norm(v) + 1e-9)
        # M3: scatter first-subtoken embeddings to word slots.
        W = int(text_lengths.max()) if B else 0
        words = np.zeros((B, W, D))
        for b in range(B):
            pos = np.nonzero(words_mask[b])[0]
            words[b, words_mask[b, pos] - 1] = emb[b, pos]
        # M5: markerV0-ish span reps over the padded span_idx grid.
        Smax = span_idx.shape[1]
        reps = np.zeros((B, Smax, D))
        for b in range(B):
            if W == 0:
                continue
            st = np.clip(span_idx[b, :, 0], 0, W - 1)
            en = np.clip(span_idx[b, :, 1], 0, W - 1)
            cat = np.concatenate([words[b][st], words[b][en]], axis=1)
            r = np.tanh(_mm(cat, self.w_span))
            reps[b] = r / (np.linalg.norm(r, axis=1, keepdims=True) + 1e-9)
        return {
            "prompts": prompts,
            "reps": reps,
            "words": words,
            "W": W,
            "B": B,
            "C": C,
            "span_idx": span_idx,
            "text_lengths": text_lengths,
            "input_ids": input_ids,
            "emb": emb,
        }

    def _span_logits(self, state) -> np.ndarray:
        B, W, C = state["B"], state["W"], state["C"]
        Smax = state["reps"].shape[1]
        K = Smax // W if W else 0
        logits = np.zeros((B, W, K, C))
        for b in range(B):
            # M6: einsum span×label (base.py:409), fixed-order reduction.
            sl = (_mm(state["reps"][b], state["prompts"][b].T) - self.margin) / self.temperature
            logits[b] = sl.reshape(W, K, C)
        return logits


class FakeTokenSession(FakeSpanSession):
    """Token-graph fake: (3, B, W, C) start/end/inside logits from word
    features vs <<ENT>> prompt features (scorers.py:45-81 semantics;
    position-first layout per the export spec, model.py:1941-1989)."""

    input_names: Sequence[str] = TOKEN_INPUT_NAMES

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        rng = np.random.default_rng(self.seed + 7)
        base = rng.standard_normal((self.dim, self.dim))
        self.w_chan = np.stack(
            [
                (base + 0.25 * rng.standard_normal((self.dim, self.dim)))
                / np.sqrt(self.dim)
                for _ in range(3)
            ]
        )

    def _token_logits(self, state) -> np.ndarray:
        B, W, C = state["B"], state["W"], state["C"]
        words, prompts = state["words"], state["prompts"]
        logits = np.zeros((3, B, W, C))
        for ch in range(3):
            for b in range(B):
                proj = np.tanh(_mm(words[b], self.w_chan[ch]))
                proj /= np.linalg.norm(proj, axis=1, keepdims=True) + 1e-9
                logits[ch, b] = (_mm(proj, prompts[b].T) - self.margin) / self.temperature
        return logits

    def run(self, output_names, feed: Dict[str, np.ndarray]):
        return [self._token_logits(self._encode(feed))]


class FakeRelexSession(FakeSpanSession):
    """Relex graph fake: adds rel_idx / rel_logits / rel_mask outputs.

    Mirrors UniEncoderSpanRelexModel.forward's inference tail
    (base.py:2211-2258) with the export-default entity threshold 0.5:
    packed confident spans in flat-index order (base.py:2051-2074),
    sigmoid bilinear adjacency, all directed pairs above 0.5 in
    row-major order (modeling/utils.py:209-296), pair×relation scoring
    against the ``<<REL>>`` prompt features.
    """

    output_names: Sequence[str] = RELEX_OUTPUT_NAMES

    def __init__(self, *args, threshold: float = 0.5, top_k: int = 64, **kwargs):
        super().__init__(*args, **kwargs)
        self.threshold = threshold
        # max confident spans entering the relex tail — the reference's
        # top_k selection cap (base.py:2064-2068); bounds the E² pair
        # grid exactly as the real model does
        self.top_k = top_k

    def _rel_prompt_feats(self, state) -> List[np.ndarray]:
        """<<REL>> prompt features per row (M2 for the relation block)."""
        B = state["B"]
        input_ids = state["input_ids"]
        emb = state["emb"]
        rel_prompts: List[np.ndarray] = []
        for b in range(B):
            pos = np.nonzero(input_ids[b] == self.rel_token_id)[0]
            feats = []
            for p in pos:
                nxt = emb[b, p + 1] if p + 1 < emb.shape[1] else 0.0
                v = emb[b, p] + nxt
                feats.append(v / (np.linalg.norm(v) + 1e-9))
            rel_prompts.append(np.stack(feats) if feats else np.zeros((0, self.dim)))
        return rel_prompts

    @staticmethod
    def _pad_rel_outputs(per_doc_pairs, per_doc_logits, B, C_rel):
        """Pad per-doc pair lists to the batch (rel_idx/rel_logits/rel_mask)."""
        N = max((len(p) for p in per_doc_pairs), default=0)
        rel_idx = np.zeros((B, max(N, 1), 2), dtype=np.int64)
        rel_logits = np.full((B, max(N, 1), C_rel), -1e9)
        rel_mask = np.zeros((B, max(N, 1)), dtype=np.int64)
        for b in range(B):
            n = len(per_doc_pairs[b])
            if n:
                rel_idx[b, :n] = per_doc_pairs[b]
                rel_logits[b, :n] = per_doc_logits[b]
                rel_mask[b, :n] = 1
        return rel_idx, rel_logits, rel_mask

    def _relex_tail(self, reps: np.ndarray, rel_prompt: np.ndarray, thr_logit: float):
        """Adjacency + directed pairs + pair×relation for ONE doc's
        packed/candidate reps (base.py:2216-2256 at B=1). Returns
        (pairs (n, 2) int64, rel_logits (n, C_rel))."""
        E = len(reps)
        C_rel = rel_prompt.shape[0]
        if E < 2 or C_rel == 0:
            return np.zeros((0, 2), dtype=np.int64), np.zeros((0, C_rel))
        adj = (_mm(_mm(reps, self.w_adj), reps.T) - self.margin) / self.temperature
        rows, cols = np.nonzero(~np.eye(E, dtype=bool))  # row-major (i, j)
        sel = adj[rows, cols] > thr_logit  # adjacency_threshold = threshold
        pairs = np.stack([rows[sel], cols[sel]], axis=1).astype(np.int64)
        if len(pairs) == 0:
            return np.zeros((0, 2), dtype=np.int64), np.zeros((0, C_rel))
        head, tail = reps[pairs[:, 0]], reps[pairs[:, 1]]
        pair_rep = np.tanh(_mm(np.concatenate([head, tail], axis=1), self.w_pair))
        pair_rep /= np.linalg.norm(pair_rep, axis=1, keepdims=True) + 1e-9
        rl = (_mm(pair_rep, rel_prompt.T) - self.margin) / self.temperature
        return pairs, rl

    def run(self, output_names, feed: Dict[str, np.ndarray]):
        state = self._encode(feed)
        logits = self._span_logits(state)
        B, W = state["B"], state["W"]
        rel_prompts = self._rel_prompt_feats(state)
        C_rel = rel_prompts[0].shape[0] if B else 0

        per_doc_pairs: List[np.ndarray] = []
        per_doc_logits: List[np.ndarray] = []
        # sigmoid(x) > t ⇔ x > log(t / (1 - t))
        thr_logit = float(np.log(self.threshold / (1.0 - self.threshold)))
        K = logits.shape[2]
        for b in range(B):
            L = int(state["text_lengths"][b])
            flat = logits[b].reshape(W * K, -1)[: L * K]
            sidx = state["span_idx"][b][: L * K]
            valid = sidx[:, 1] < L
            maxp = flat.max(axis=1)
            keep = (maxp > thr_logit) & valid
            packed = np.nonzero(keep)[0]
            if len(packed) > self.top_k:
                # top_k by score (stable), then ascending flat order —
                # the packed-order contract (base.py:2051-2074)
                best = np.argsort(-maxp[packed], kind="stable")[: self.top_k]
                packed = np.sort(packed[best])
            reps = state["reps"][b][packed]
            pairs, rl = self._relex_tail(reps, rel_prompts[b], thr_logit)
            per_doc_pairs.append(pairs)
            per_doc_logits.append(rl)
        rel_idx, rel_logits, rel_mask = self._pad_rel_outputs(
            per_doc_pairs, per_doc_logits, B, C_rel
        )
        return [logits, rel_idx, rel_logits, rel_mask]


class FakeTokenRelexSession(FakeTokenSession, FakeRelexSession):
    """Token-relex graph fake (UniEncoderTokenRelexGLiNER export,
    gliner/model.py:2916-2984): TOKEN inputs — input_ids /
    attention_mask / words_mask / text_lengths, NO span grid — and
    RELEX outputs — (3, B, W, C) position-first logits + rel_idx /
    rel_logits / rel_mask.

    The in-graph tail mirrors the token-relex forward: candidate spans
    come from the BIO start/end/inside flags at the export-default
    threshold (extract_spans_from_tokens, modeling/utils.py:299-379 via
    the represent_spans override, base.py:2497-2514), reps are built
    from the word embeddings for exactly those candidates, then the
    SAME adjacency → directed-pairs → pair×relation tail as the span
    relex fake (base.py:2216-2256). ``top_k`` caps the candidate list
    (a fake-weight safety bound on the E² pair grid; the reference
    token forward itself is uncapped)."""

    input_names: Sequence[str] = TOKEN_INPUT_NAMES
    output_names: Sequence[str] = RELEX_OUTPUT_NAMES

    def run(self, output_names, feed: Dict[str, np.ndarray]):
        from ..kernel.decoding import extract_spans_from_token_probs

        state = self._encode(feed)
        logits = self._token_logits(state)  # (3, B, W, C)
        B = state["B"]
        rel_prompts = self._rel_prompt_feats(state)
        C_rel = rel_prompts[0].shape[0] if B else 0
        # sigmoid(x) > t ⇔ x > log(t / (1 - t)) — run the proposal on
        # raw logits with the logit-space threshold (same decision set)
        thr_logit = float(np.log(self.threshold / (1.0 - self.threshold)))
        per_doc_pairs: List[np.ndarray] = []
        per_doc_logits: List[np.ndarray] = []
        for b in range(B):
            L = int(state["text_lengths"][b])
            cand = extract_spans_from_token_probs(
                logits[0, b, :L], logits[1, b, :L], logits[2, b, :L], thr_logit
            )
            if len(cand) > self.top_k:
                cand = cand[: self.top_k]
            if len(cand) and L:
                words = state["words"][b]
                st = np.clip(cand[:, 0], 0, L - 1)
                en = np.clip(cand[:, 1], 0, L - 1)
                cat = np.concatenate([words[st], words[en]], axis=1)
                reps = np.tanh(_mm(cat, self.w_span))  # M5, markerV0-ish
                reps /= np.linalg.norm(reps, axis=1, keepdims=True) + 1e-9
            else:
                reps = np.zeros((0, self.dim))
            pairs, rl = self._relex_tail(reps, rel_prompts[b], thr_logit)
            per_doc_pairs.append(pairs)
            per_doc_logits.append(rl)
        rel_idx, rel_logits, rel_mask = self._pad_rel_outputs(
            per_doc_pairs, per_doc_logits, B, C_rel
        )
        return [logits, rel_idx, rel_logits, rel_mask]


class FakeBiEncoderSpanSession(FakeSpanSession):
    """Bi-encoder span graph fake (gliner/onnx/model.py:160-220): same
    text dataflow as the uni-encoder span graph but the label features
    arrive as the ``labels_embeddings`` (C, D) input — the text feed
    carries NO ``<<ENT>>`` prompt, and the graph consumes the
    precomputed matrix directly (the M8 bi-encoder precompute).
    Because the fake *uses* the tensor, a pipeline that forgot to
    thread the embeddings (or threaded a wrong-shape matrix) changes
    the logits — tests exercise the real feed path, not just shapes."""

    input_names: Sequence[str] = BIENCODER_SPAN_INPUT_NAMES

    def run(self, output_names, feed: Dict[str, np.ndarray]):
        if "labels_embeddings" not in feed:
            raise ValueError(
                "bi-encoder graph requires the labels_embeddings input"
            )
        state = self._encode(feed)
        embs = np.asarray(feed["labels_embeddings"], dtype=np.float64)
        if embs.ndim != 2 or embs.shape[1] != self.dim:
            raise ValueError(
                f"labels_embeddings must be (C, {self.dim}), got {embs.shape}"
            )
        state["prompts"] = np.repeat(embs[None], state["B"], axis=0)
        state["C"] = embs.shape[0]
        return [self._span_logits(state)]


def fake_biencoder_span_encoder_factory():
    from .onnx_backend import OnnxBiEncoderSpanEncoder

    return OnnxBiEncoderSpanEncoder(session=FakeBiEncoderSpanSession())


class FakeBiEncoderTokenSession(FakeTokenSession):
    """Bi-encoder TOKEN graph fake (BiEncoderTokenGLiNER,
    gliner/model.py:2033-2070): token-family inputs — no span grid, no
    ``<<ENT>>`` prompt in the text — with the label features arriving
    as the ``labels_embeddings`` (C, D) input; (3, B, W, C)
    position-first logits out. As with the span variant, the fake
    USES the tensor: a pipeline that failed to thread the embeddings
    (or threaded a wrong shape) changes the logits, so tests exercise
    the real feed path."""

    input_names: Sequence[str] = BIENCODER_TOKEN_INPUT_NAMES

    def run(self, output_names, feed: Dict[str, np.ndarray]):
        if "labels_embeddings" not in feed:
            raise ValueError(
                "bi-encoder graph requires the labels_embeddings input"
            )
        state = self._encode(feed)
        embs = np.asarray(feed["labels_embeddings"], dtype=np.float64)
        if embs.ndim != 2 or embs.shape[1] != self.dim:
            raise ValueError(
                f"labels_embeddings must be (C, {self.dim}), got {embs.shape}"
            )
        state["prompts"] = np.repeat(embs[None], state["B"], axis=0)
        state["C"] = embs.shape[0]
        return [self._token_logits(state)]


def fake_biencoder_token_encoder_factory():
    from .onnx_backend import OnnxBiEncoderTokenEncoder

    return OnnxBiEncoderTokenEncoder(session=FakeBiEncoderTokenSession())
