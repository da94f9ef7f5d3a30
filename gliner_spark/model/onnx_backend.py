"""ONNX production backend: feed construction + ORT session execution.

Code-complete implementation of the reference's ONNX inference contract:

* input spec (uni-encoder span): ``input_ids, attention_mask,
  words_mask, text_lengths, span_idx, span_mask`` → ``logits``
  (gliner/model.py:1875-1901);
* relex spec adds outputs ``rel_idx, rel_logits, rel_mask``
  (gliner/model.py:2825-2865);
* feed preparation drops keys the session doesn't expect, mirroring
  ``BaseORTModel.prepare_inputs`` (gliner/onnx/model.py:43-67);
* the session is an executor-level singleton per model path, mirroring
  the single ``ort.InferenceSession`` (gliner/model.py:670-685) — on a
  cluster the .onnx file ships via ``spark-submit --files`` and loads
  from ``SparkFiles.get`` once per python worker.

Everything upstream of ``session.run`` is pure numpy and runs
identically under a real ``onnxruntime.InferenceSession`` or any object
with the same ``run/get_inputs/get_outputs`` surface (see
``model/ort_testing.FakeSpanSession`` for the contract-faithful fake
used in tests and sandbox end-to-end runs).
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..kernel.prompts import build_entity_prompt, build_relex_prompt
from ..kernel.spans import span_idx_array
from ..kernel.wordmask import word_masks
from ..kernel.decoding import sigmoid

SPAN_INPUT_NAMES = (
    "input_ids",
    "attention_mask",
    "words_mask",
    "text_lengths",
    "span_idx",
    "span_mask",
)
SPAN_OUTPUT_NAMES = ("logits",)
RELEX_OUTPUT_NAMES = ("logits", "rel_idx", "rel_logits", "rel_mask")
# Token model (gliner/model.py:1941-1989): no span grid; logits come
# back position-first (3=start/end/inside, B, W, C).
TOKEN_INPUT_NAMES = ("input_ids", "attention_mask", "words_mask", "text_lengths")
# Bi-encoder span model exported WITH the precomputed-embeddings input
# (BaseBiEncoderGLiNER._get_embedding_input_name, gliner/model.py:1746;
# BiEncoderSpanORTModel feeds labels_embeds straight into the graph,
# gliner/onnx/model.py:160-220): the text feed carries NO label prompt
# — labels arrive as a (C, D) float tensor.
BIENCODER_SPAN_INPUT_NAMES = SPAN_INPUT_NAMES + ("labels_embeddings",)
# Bi-encoder TOKEN model (BiEncoderTokenGLiNER, gliner/model.py:2033-
# 2070 + BiEncoderTokenORTModel): token-family base inputs (no span
# grid) plus the precomputed labels_embeddings tensor; logits come
# back position-first (3, B, W, C) like every token graph.
BIENCODER_TOKEN_INPUT_NAMES = TOKEN_INPUT_NAMES + ("labels_embeddings",)


@dataclass
class FeedMeta:
    """Per-batch bookkeeping needed to slice the padded outputs."""

    word_counts: List[int]  # words per doc (post-truncation)
    prompt_len: int  # prompt words prepended to every doc
    max_words: int  # batch max of word_counts


def build_span_feed(
    batch_tokens: Sequence[Sequence[str]],
    labels: Sequence[str],
    tokenizer,
    max_width: int = 12,
    relations: Optional[Sequence[str]] = None,
    include_span_grid: bool = True,
    label_embeddings: Optional[np.ndarray] = None,
) -> Tuple[Dict[str, np.ndarray], FeedMeta]:
    """Word-token batch → the exact ONNX feed dict.

    Steps (one per reference operator):
      T1/T2 prompt prepend (processor.py:179-197, 1846-1858) →
      T3 subword tokenize (processor.py:294-300) →
      T4 words_mask (utils.py:95-179 — continuation subtokens and
      prompt words map to 0, first subtokens to 1-based word index) →
      T5 span enumeration + T10 padding (utils.py:215-252, 7-55).

    All tensors are int64, matching the exported graph's input dtypes.
    """
    if not batch_tokens:
        raise ValueError("batch_tokens must be non-empty")
    prompted: List[List[str]] = []
    prompt_len = None
    for tokens in batch_tokens:
        if label_embeddings is not None:
            # bi-encoder feed: labels ride the labels_embeddings tensor,
            # the text carries no <<ENT>> prompt (processor parity: the
            # bi-encoder data processor never prepends one)
            p, plen = list(tokens), 0
        elif relations is not None:
            p, plen = build_relex_prompt(tokens, labels, relations)
        else:
            p, plen = build_entity_prompt(tokens, labels)
        prompted.append(p)
        prompt_len = plen  # same labels for every doc → constant
    sub = tokenizer(prompted)
    B = len(batch_tokens)
    masks = word_masks(sub.word_ids, skip_first_words=[prompt_len] * B)
    words_mask = np.asarray(masks, dtype=np.int64)

    word_counts = [len(t) for t in batch_tokens]
    max_words = max(word_counts) if word_counts else 0
    feed = {
        "input_ids": sub.input_ids,
        "attention_mask": sub.attention_mask,
        "words_mask": words_mask,
        "text_lengths": np.asarray(word_counts, dtype=np.int64).reshape(B, 1),
    }
    if include_span_grid:  # token-mode graphs declare no span inputs
        K = max_width
        s_max = max_words * K
        span_idx = np.zeros((B, s_max, 2), dtype=np.int64)
        span_mask = np.zeros((B, s_max), dtype=np.int64)
        for b, L in enumerate(word_counts):
            if L == 0:
                continue
            sidx = span_idx_array(L, K)  # (L*K, 2), row-major (i, i+j)
            span_idx[b, : L * K] = sidx
            span_mask[b, : L * K] = (sidx[:, 1] < L).astype(np.int64)
        feed["span_idx"] = span_idx
        feed["span_mask"] = span_mask
    if label_embeddings is not None:
        # float32: the dtype real bi-encoder exports declare for the
        # labels_embeddings input (torch defaults; onnx/model.py)
        feed["labels_embeddings"] = np.asarray(label_embeddings, dtype=np.float32)
    return feed, FeedMeta(word_counts, prompt_len, max_words)


def prepare_feed_for_session(session, feed: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop feed keys the graph doesn't declare (onnx/model.py:43-67)."""
    try:
        expected = {i.name for i in session.get_inputs()}
    except AttributeError:
        return dict(feed)
    prepared = {}
    for key, arr in feed.items():
        if key not in expected:
            warnings.warn(
                f"Input key '{key}' not found in ONNX model's input names. Ignored.",
                stacklevel=2,
            )
            continue
        prepared[key] = arr
    return prepared


_SESSION_CACHE: Dict[str, object] = {}


def _load_session(model_path: str, providers: Optional[List[str]] = None):
    """Executor-singleton ORT session per model path (model.py:670-685)."""
    sess = _SESSION_CACHE.get(model_path)
    if sess is not None:
        return sess
    try:
        import onnxruntime as ort  # type: ignore
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "onnxruntime is not installed in this environment. Pass a "
            "session object (any .run/.get_inputs-compatible object, e.g. "
            "ort_testing.FakeSpanSession) or install onnxruntime and ship "
            "the exported model via spark-submit --files."
        ) from e
    opts = ort.SessionOptions()  # pragma: no cover
    opts.graph_optimization_level = ort.GraphOptimizationLevel.ORT_ENABLE_ALL  # pragma: no cover
    sess = ort.InferenceSession(  # pragma: no cover
        model_path, opts, providers=providers or ["CPUExecutionProvider"]
    )
    _SESSION_CACHE[model_path] = sess  # pragma: no cover
    return sess  # pragma: no cover


class OnnxSpanEncoder:
    """Uni-encoder span model over an ORT session.

    ``span_probs(batch_tokens, labels)`` returns one ``(L_b, K, C)``
    sigmoided probability tensor per document — the shape the existing
    decode kernel (kernel/decoding.decode_span_probs) consumes, so the
    ONNX path reuses the greedy/overlap/char-map machinery unchanged.
    """

    supports_relations = False

    def __init__(
        self,
        session=None,
        model_path: Optional[str] = None,
        tokenizer=None,
        max_width: int = 12,
        providers: Optional[List[str]] = None,
    ):
        if session is None:
            if model_path is None:
                raise ValueError("provide either session or model_path")
            session = _load_session(model_path, providers)
        if tokenizer is None:
            from .subword import DeterministicSubwordTokenizer

            tokenizer = DeterministicSubwordTokenizer()
        self.session = session
        self.tokenizer = tokenizer
        self.max_width = int(max_width)

    # -- core ---------------------------------------------------------
    def _run(self, feed: Dict[str, np.ndarray]) -> List[np.ndarray]:
        return self.session.run(None, prepare_feed_for_session(self.session, feed))

    def span_logits(
        self,
        batch_tokens: Sequence[Sequence[str]],
        labels: Sequence[str],
        relations: Optional[Sequence[str]] = None,
    ) -> Tuple[List[np.ndarray], FeedMeta, List[np.ndarray]]:
        """Raw per-doc (L_b, K, C) logits + outputs for subclasses."""
        feed, meta = build_span_feed(
            batch_tokens, labels, self.tokenizer, self.max_width, relations
        )
        outputs = self._run(feed)
        logits = np.asarray(outputs[0])  # (B, max_words, K, C)
        per_doc = [logits[b, : meta.word_counts[b]] for b in range(len(batch_tokens))]
        return per_doc, meta, outputs

    def span_probs(
        self, batch_tokens: Sequence[Sequence[str]], labels: Sequence[str]
    ) -> List[np.ndarray]:
        per_doc, _meta, _outputs = self.span_logits(batch_tokens, labels)
        return [sigmoid(x) for x in per_doc]


class OnnxTokenEncoder(OnnxSpanEncoder):
    """Token-mode model (uni-encoder token, gliner/model.py:1941-1989):
    same feed minus the span grid (``prepare_feed_for_session`` drops
    span_idx/span_mask against the token graph's declared inputs);
    logits come back ``(3, B, W, C)`` — start/end/inside channel first
    (the reference's dynamic axis 0 = "position") — and are re-laid to
    the decode kernel's ``(W, C, 3)`` per document.
    """

    supports_relations = False

    def token_probs(
        self, batch_tokens: Sequence[Sequence[str]], labels: Sequence[str]
    ) -> List[np.ndarray]:
        feed, meta = build_span_feed(
            batch_tokens, labels, self.tokenizer, self.max_width,
            include_span_grid=False,
        )
        outputs = self._run(feed)
        logits = np.asarray(outputs[0])  # (3, B, W, C)
        if logits.ndim != 4 or logits.shape[0] != 3:
            raise ValueError(
                f"token graph must emit (3, B, W, C) logits, got {logits.shape}"
            )
        out = []
        for b in range(len(batch_tokens)):
            w = meta.word_counts[b]
            out.append(sigmoid(np.transpose(logits[:, b, :w, :], (1, 2, 0))))
        return out


class OnnxRelexEncoder(OnnxSpanEncoder):
    """Joint relex model: graph also emits rel_idx/rel_logits/rel_mask.

    ``relex_outputs`` returns per-doc (span_probs, rel_idx, rel_probs)
    with padding rows removed via rel_mask — the exact inputs of the
    relation decode kernel (kernel/decoding.decode_relations), which
    preserves the post-greedy index-alignment quirk (decoder.py:822).
    """

    supports_relations = True

    def relex_outputs(
        self,
        batch_tokens: Sequence[Sequence[str]],
        labels: Sequence[str],
        relations: Sequence[str],
    ) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        per_doc_logits, _meta, outputs = self.span_logits(
            batch_tokens, labels, relations=relations
        )
        if len(outputs) < 4:
            raise ValueError(
                "session returned a span-only output set; OnnxRelexEncoder "
                f"needs {RELEX_OUTPUT_NAMES}"
            )
        rel_idx = np.asarray(outputs[1])  # (B, N, 2)
        rel_logits = np.asarray(outputs[2])  # (B, N, C_rel)
        rel_mask = np.asarray(outputs[3]).astype(bool)  # (B, N)
        result = []
        for b, logits in enumerate(per_doc_logits):
            keep = rel_mask[b]
            result.append(
                (sigmoid(logits), rel_idx[b][keep], sigmoid(rel_logits[b][keep]))
            )
        return result


class OnnxTokenRelexEncoder(OnnxTokenEncoder):
    """Token-mode joint relex graph (UniEncoderTokenRelexGLiNER ONNX
    export, gliner/model.py:2916-2984): the declared inputs are the
    token-graph four — input_ids / attention_mask / words_mask /
    text_lengths, NO span grid — and the outputs are the relex four —
    logits (3, B, W, C) position-first, rel_idx, rel_logits, rel_mask.
    Candidate-span proposal (extract_spans_from_tokens), adjacency and
    pair scoring all run IN-GRAPH at the export-default thresholds;
    this adapter only re-lays the outputs per document for the decode
    kernels."""

    supports_relations = True

    def token_relex_outputs(
        self,
        batch_tokens: Sequence[Sequence[str]],
        labels: Sequence[str],
        relations: Sequence[str],
    ) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Per-doc (token_probs (W, C, 3), rel_idx (N, 2),
        rel_probs (N, C_rel)) with padding rows removed via rel_mask —
        the exact inputs of decode_token_scores + decode_relations."""
        feed, meta = build_span_feed(
            batch_tokens, labels, self.tokenizer, self.max_width,
            relations=relations, include_span_grid=False,
        )
        outputs = self._run(feed)
        logits = np.asarray(outputs[0])  # (3, B, W, C)
        if logits.ndim != 4 or logits.shape[0] != 3:
            raise ValueError(
                f"token-relex graph must emit (3, B, W, C) logits, got "
                f"{logits.shape}"
            )
        if len(outputs) < 4:
            raise ValueError(
                "session returned a token-only output set; "
                f"OnnxTokenRelexEncoder needs {RELEX_OUTPUT_NAMES}"
            )
        rel_idx = np.asarray(outputs[1])  # (B, N, 2)
        rel_logits = np.asarray(outputs[2])  # (B, N, C_rel)
        rel_mask = np.asarray(outputs[3]).astype(bool)  # (B, N)
        result = []
        for b in range(len(batch_tokens)):
            w = meta.word_counts[b]
            probs = sigmoid(np.transpose(logits[:, b, :w, :], (1, 2, 0)))
            keep = rel_mask[b]
            result.append(
                (probs, rel_idx[b][keep], sigmoid(rel_logits[b][keep]))
            )
        return result


class OnnxBiEncoderSpanEncoder(OnnxSpanEncoder):
    """Bi-encoder span graph exported with the ``labels_embeddings``
    input (gliner/model.py:1746, onnx/model.py:160-220): the caller
    precomputes the label matrix ONCE (``encode_labels``,
    model.py:1627-1656) and every inference feed carries it as a
    (C, D) float tensor — no label prompt in the text, no label
    re-encoding per document. This is the M8 bi-encoder precompute win
    on the SESSION backend: at 10^12 documents the label encoder runs
    C times total instead of C times per batch."""

    accepts_label_embeddings = True

    def span_probs(
        self,
        batch_tokens: Sequence[Sequence[str]],
        labels: Sequence[str],
        label_embeddings: Optional[np.ndarray] = None,
    ) -> List[np.ndarray]:
        if label_embeddings is None:
            raise ValueError(
                "bi-encoder session graphs take precomputed label "
                "embeddings (the labels_embeddings input, "
                "gliner/model.py:1746); compute them once with "
                "encode_labels and pass them through the pipeline's "
                "label_embeddings parameter"
            )
        feed, meta = build_span_feed(
            batch_tokens, labels, self.tokenizer, self.max_width,
            label_embeddings=label_embeddings,
        )
        outputs = self._run(feed)
        logits = np.asarray(outputs[0])  # (B, max_words, K, C)
        return [
            sigmoid(logits[b, : meta.word_counts[b]])
            for b in range(len(batch_tokens))
        ]


class OnnxBiEncoderTokenEncoder(OnnxTokenEncoder):
    """Bi-encoder TOKEN graph (BiEncoderTokenGLiNER, gliner/model.py:
    2033-2070): token-family inputs (no span grid, no ``<<ENT>>``
    prompt in the text) plus the driver-precomputed ``labels_embeddings``
    tensor; (3, B, W, C) position-first logits out. The M8 precompute
    win on the token session backend — the label encoder runs C times
    per JOB, never per batch."""

    accepts_label_embeddings = True

    def token_probs(
        self,
        batch_tokens: Sequence[Sequence[str]],
        labels: Sequence[str],
        label_embeddings: Optional[np.ndarray] = None,
    ) -> List[np.ndarray]:
        if label_embeddings is None:
            raise ValueError(
                "bi-encoder session graphs take precomputed label "
                "embeddings (the labels_embeddings input); compute them "
                "once with encode_labels and pass them through the "
                "pipeline's label_embeddings parameter"
            )
        feed, meta = build_span_feed(
            batch_tokens, labels, self.tokenizer, self.max_width,
            include_span_grid=False, label_embeddings=label_embeddings,
        )
        outputs = self._run(feed)
        logits = np.asarray(outputs[0])  # (3, B, W, C)
        if logits.ndim != 4 or logits.shape[0] != 3:
            raise ValueError(
                f"token graph must emit (3, B, W, C) logits, got {logits.shape}"
            )
        return [
            sigmoid(np.transpose(logits[:, b, : meta.word_counts[b], :], (1, 2, 0)))
            for b in range(len(batch_tokens))
        ]
