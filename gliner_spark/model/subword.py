"""Subword tokenization (T3) for the ONNX production backend.

The reference feeds word-split texts to a HuggingFace fast tokenizer with
``is_split_into_words=True, padding="longest", truncation=True``
(gliner/data_processing/processor.py:294-300) and then derives the
``words_mask`` from the tokenizer's word-id alignment
(processor.py:301; gliner/data_processing/utils.py:95-179).

This module normalizes that contract into a plain, Arrow-friendly shape
(:class:`SubwordBatch`) with two providers:

* :class:`HFSubwordTokenizer` — wraps a real HuggingFace fast tokenizer
  (import-gated; ``transformers`` ships the exported model's vocab so
  input ids match the ONNX graph's embedding table);
* :class:`DeterministicSubwordTokenizer` — a dependency-free fake that
  honors the same contract (greedy fixed-length pieces, blake2b-hashed
  ids, CLS/SEP specials with ``None`` word ids, longest-padding). It
  exists so the full ONNX feed path is executable and hash-stable in
  environments without transformers/onnxruntime, and so tests can
  detect word-mask/prompt bugs through a session fake that actually
  consumes the feed.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from ..kernel.prompts import ENT_TOKEN, REL_TOKEN, SEP_TOKEN


@dataclass
class SubwordBatch:
    """The tensorized output of subword tokenization for one batch.

    ``input_ids``/``attention_mask`` are (B, S) int64; ``word_ids[b][s]``
    is the 0-based index of the word that produced subtoken s, or None
    for special/padding positions — exactly the HF fast-tokenizer
    ``word_ids(b)`` contract the reference's word-mask builder consumes.
    """

    input_ids: np.ndarray
    attention_mask: np.ndarray
    word_ids: List[List[Optional[int]]]


class HFSubwordTokenizer:
    """Adapter over a HuggingFace fast tokenizer.

    Use :func:`load_hf_tokenizer` to construct from a model name/path.
    The tokenizer must be a *fast* tokenizer (word_ids() requires the
    Rust backend — the same requirement the reference has).
    """

    def __init__(self, tokenizer):
        self.tokenizer = tokenizer

    def __call__(self, batch_word_lists: Sequence[Sequence[str]]) -> SubwordBatch:
        enc = self.tokenizer(
            [list(ws) for ws in batch_word_lists],
            is_split_into_words=True,
            truncation=True,
            padding="longest",
            return_tensors="np",
        )
        word_ids = [enc.word_ids(i) for i in range(len(batch_word_lists))]
        return SubwordBatch(
            input_ids=np.asarray(enc["input_ids"], dtype=np.int64),
            attention_mask=np.asarray(enc["attention_mask"], dtype=np.int64),
            word_ids=word_ids,
        )

    def token_id(self, token: str) -> int:
        return int(self.tokenizer.convert_tokens_to_ids(token))


def load_hf_tokenizer(name_or_path: str) -> HFSubwordTokenizer:
    """Load the exported model's tokenizer (driver-side; ship the files
    with ``spark-submit --files`` and load from SparkFiles on workers).

    The GLiNER special tokens ``<<ENT>>/<<SEP>>/<<REL>>`` already live in
    a published GLiNER checkpoint's vocab (gliner/config.py:35-36,197);
    they are added here only if missing (fresh exports).
    """
    try:
        from transformers import AutoTokenizer  # type: ignore
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "HFSubwordTokenizer requires the transformers package (not "
            "installed in this sandbox). Use DeterministicSubwordTokenizer "
            "for dependency-free runs."
        ) from e
    tok = AutoTokenizer.from_pretrained(name_or_path, use_fast=True)  # pragma: no cover
    missing = [  # pragma: no cover
        t
        for t in (ENT_TOKEN, SEP_TOKEN, REL_TOKEN)
        if tok.convert_tokens_to_ids(t) == tok.unk_token_id
    ]
    if missing:  # pragma: no cover
        tok.add_tokens(missing)
    return HFSubwordTokenizer(tok)  # pragma: no cover


class DeterministicSubwordTokenizer:
    """Contract-faithful fake subword tokenizer (no external deps).

    * each word splits greedily into pieces of ≤ ``piece_len`` chars
      (so multi-subtoken words exercise the continuation-subtoken → 0
      branch of the word mask);
    * ids are blake2b(piece) folded into [n_special, vocab_size);
    * the GLiNER special prompt tokens map to fixed reserved ids so a
      session fake can locate ``<<ENT>>`` positions (M2, prompt-feature
      extraction);
    * sequences get CLS/SEP sentinels with ``None`` word ids and pad to
      the batch max with ``pad_id``/attention 0 — the "longest" padding
      the reference requests.
    """

    PAD_ID = 0
    CLS_ID = 1
    SEP_ID = 2  # sentence-level [SEP], not the GLiNER <<SEP>> prompt token
    ENT_TOKEN_ID = 3
    GLINER_SEP_ID = 4
    REL_TOKEN_ID = 5
    _N_SPECIAL = 6

    def __init__(self, vocab_size: int = 50_000, piece_len: int = 4, max_length: int = 2048):
        self.vocab_size = int(vocab_size)
        self.piece_len = int(piece_len)
        self.max_length = int(max_length)
        self._special = {
            ENT_TOKEN: self.ENT_TOKEN_ID,
            SEP_TOKEN: self.GLINER_SEP_ID,
            REL_TOKEN: self.REL_TOKEN_ID,
        }

    def _piece_id(self, piece: str) -> int:
        h = hashlib.blake2b(piece.encode("utf-8"), digest_size=8)
        span = self.vocab_size - self._N_SPECIAL
        return self._N_SPECIAL + int.from_bytes(h.digest(), "little") % span

    def _encode_word(self, word: str) -> List[int]:
        if word in self._special:
            return [self._special[word]]
        pieces = [
            word[i : i + self.piece_len] for i in range(0, len(word), self.piece_len)
        ] or [word]
        return [self._piece_id(p) for p in pieces]

    def __call__(self, batch_word_lists: Sequence[Sequence[str]]) -> SubwordBatch:
        seq_ids: List[List[int]] = []
        seq_wids: List[List[Optional[int]]] = []
        for words in batch_word_lists:
            ids: List[int] = [self.CLS_ID]
            wids: List[Optional[int]] = [None]
            for w_idx, word in enumerate(words):
                for pid in self._encode_word(str(word)):
                    ids.append(pid)
                    wids.append(w_idx)
                if len(ids) >= self.max_length - 1:  # truncation=True
                    ids = ids[: self.max_length - 1]
                    wids = wids[: self.max_length - 1]
                    break
            ids.append(self.SEP_ID)
            wids.append(None)
            seq_ids.append(ids)
            seq_wids.append(wids)
        s_max = max((len(s) for s in seq_ids), default=0)
        B = len(seq_ids)
        input_ids = np.full((B, s_max), self.PAD_ID, dtype=np.int64)
        attention = np.zeros((B, s_max), dtype=np.int64)
        for b, ids in enumerate(seq_ids):
            input_ids[b, : len(ids)] = ids
            attention[b, : len(ids)] = 1
            seq_wids[b] = seq_wids[b] + [None] * (s_max - len(ids))
        return SubwordBatch(
            input_ids=input_ids, attention_mask=attention, word_ids=seq_wids
        )

    def token_id(self, token: str) -> int:
        if token in self._special:
            return self._special[token]
        ids = self._encode_word(token)
        if len(ids) != 1:
            raise ValueError(f"{token!r} is not a single-piece token")
        return ids[0]
