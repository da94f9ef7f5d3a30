"""Generative label decoding (M15/D10) — deterministic analog.

The reference's encoder-decoder family (UniEncoderSpanDecoderGLiNER,
gliner/model.py:2066-2345) attaches an autoregressive LM head that
GENERATES the entity-type label text for each confident span (or for
each prompt class), optionally trie-constrained to a closed label set:

* label trie — model.py:2107-2131 ``set_labels_trie``: encode each
  constraint label with the decoder tokenizer, strip a leading BOS,
  append EOS, insert into a ``LabelsTrie``;
* generation — modeling/decoder.py:183-299
  ``generate_from_embeds_custom``: token-by-token loop; at each step
  the allowed set is ``trie.get(generated_so_far)`` (falling back to
  ``[eos]`` when empty), disallowed logits are masked to -inf, the
  next token is argmax (greedy) per unfinished row, rows finish on EOS
  and the loop breaks when none remain; ``num_return_sequences > 1``
  routes through beam search (decoder.py:302-405, ``num_beams =
  num_return_sequences``);
* this family is explicitly ONNX-INCOMPATIBLE (model.py:2322-2345
  raises on export) — the reference itself runs it only under torch.

Torch and a real LM are absent from this sandbox, so — exactly like
``DeterministicEncoder`` for M1-M3 — the LM head here is a
hash-seeded deterministic analog: the CONTROL FLOW (trie constraint,
EOS fallback, per-row finish, beam expansion, flat output ordering) is
the reference's, the logits come from a seeded projection instead of
learned weights. Everything is pure numpy: the same code runs
driver-side and inside Arrow batches, bit-identically (fixed-order
einsum, no BLAS).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..kernel.labels_trie import LabelsTrie
from .encoder import DeterministicEncoder, _mm

PAD_ID, BOS_ID, EOS_ID = 0, 1, 2
_N_SPECIAL = 3


class LabelTokenizer:
    """Word-level decoder tokenizer over a CLOSED label vocabulary.

    The reference uses a pretrained subword tokenizer
    (AutoTokenizer.from_pretrained(config.labels_decoder),
    model.py:2096-2101); the sandbox analog assigns ids to the sorted
    set of words appearing in the registered label strings — sorted, so
    the mapping is independent of label order and identical in every
    executor process.
    """

    def __init__(self, labels: Sequence[str]):
        words = sorted({w for lab in labels for w in str(lab).split() if w})
        self.word_to_id: Dict[str, int] = {
            w: i + _N_SPECIAL for i, w in enumerate(words)
        }
        self.id_to_word: Dict[int, str] = {
            i: w for w, i in self.word_to_id.items()
        }
        self.vocab_size = _N_SPECIAL + len(words)

    def encode(self, label: str) -> List[int]:
        """[BOS] + word ids, like tokenizer.encode with a leading BOS
        (model.py:2124-2126 strips it before trie insertion)."""
        try:
            return [BOS_ID] + [self.word_to_id[w] for w in str(label).split() if w]
        except KeyError as exc:  # closed vocabulary — caller registers labels up front
            raise KeyError(
                f"label word {exc} not in decoder vocabulary; pass every "
                "constraint label to the tokenizer constructor"
            ) from None

    def decode(self, ids: Sequence[int]) -> str:
        """skip_special_tokens=True analog (model.py:2162)."""
        return " ".join(
            self.id_to_word[i] for i in ids if i >= _N_SPECIAL
        )


def build_labels_trie(
    labels: Sequence[str], tokenizer: LabelTokenizer
) -> LabelsTrie:
    """set_labels_trie (model.py:2107-2131): strip BOS, append EOS."""
    tokenized = []
    for label in labels:
        ids = tokenizer.encode(label)
        if ids and ids[0] == BOS_ID:
            ids = ids[1:]
        ids.append(EOS_ID)
        tokenized.append(ids)
    return LabelsTrie(tokenized)


class GenerativeLabelDecoder:
    """Trie-constrained deterministic beam decoder over label words.

    Logits analog: every vocab id gets a unit embedding (word ids via
    the shared encoder token space under a "dec" salt; specials
    likewise); the step state is the normalized sum of the span prefix
    vector and the already-generated token embeddings, projected by a
    seeded (D, D) weight; logits = vocab_embs @ state. Greedy/beam over
    these is deterministic across processes.
    """

    def __init__(self, encoder: DeterministicEncoder, tokenizer: LabelTokenizer):
        self.encoder = encoder
        self.tokenizer = tokenizer
        dim = encoder.dim
        # vocab embedding matrix (V, D) — specials then sorted words
        rows = []
        for vid in range(tokenizer.vocab_size):
            name = {PAD_ID: "<pad>", BOS_ID: "<bos>", EOS_ID: "<eos>"}.get(
                vid, tokenizer.id_to_word.get(vid, "")
            )
            rows.append(encoder.token_embedding(f"<dec>{name}"))
        self._vocab_embs = np.stack(rows) if rows else np.zeros((0, dim))
        self._w_lm = encoder._weight("lm_head", (dim, dim), fan_in=dim)

    # -- one-step logits ----------------------------------------------
    def _next_logits(self, prefix_vec: np.ndarray, generated: Sequence[int]) -> np.ndarray:
        state = prefix_vec.astype(np.float64).copy()
        for pos, tok in enumerate(generated):
            # position-weighted so permutations of the prefix differ
            state = state + self._vocab_embs[tok] / (pos + 2.0)
        state = state / (np.linalg.norm(state) + 1e-9)
        proj = _mm(state[None, :], self._w_lm)[0]
        return _mm(self._vocab_embs, proj[:, None])[:, 0]

    # -- beam search (num_beams = num_return_sequences, decoder.py:302-405)
    def generate(
        self,
        prefix_vec: np.ndarray,
        max_new_tokens: int = 15,
        trie: Optional[LabelsTrie] = None,
        num_return_sequences: int = 1,
    ) -> List[List[int]]:
        """n best token-id sequences (EOS stripped) for one prefix.

        Greedy is the width-1 special case. Ties break on token id —
        fully deterministic. Unconstrained generation allows the whole
        word vocabulary plus EOS at every step (the reference's
        unconstrained path is the raw LM distribution; the closed-world
        analog of that is the full decoder vocabulary).
        """
        n = max(1, int(num_return_sequences))
        all_words = [i for i in range(_N_SPECIAL, self.tokenizer.vocab_size)]
        # beams: (neg_logprob_sum, token_ids tuple, finished)
        beams: List[Tuple[float, Tuple[int, ...], bool]] = [(0.0, (), False)]
        for _ in range(max_new_tokens):
            if all(b[2] for b in beams):
                break
            candidates: List[Tuple[float, Tuple[int, ...], bool]] = []
            for score, seq, finished in beams:
                if finished:
                    candidates.append((score, seq, True))
                    continue
                if trie is not None:
                    allowed = trie.get(list(seq))
                    if not allowed:  # off-trie → forced EOS (decoder.py:255-257)
                        allowed = [EOS_ID]
                else:
                    allowed = all_words + [EOS_ID]
                logits = self._next_logits(prefix_vec, seq)
                sub = logits[allowed]
                # log-softmax over the ALLOWED set (the -inf mask +
                # softmax in the reference collapses to this)
                m = float(sub.max())
                lse = m + math.log(float(np.exp(sub - m).sum()))
                for tok, lg in zip(allowed, sub):
                    cand_score = score - (float(lg) - lse)
                    if tok == EOS_ID:
                        candidates.append((cand_score, seq, True))
                    else:
                        candidates.append((cand_score, seq + (tok,), False))
            candidates.sort(key=lambda c: (c[0], c[1]))
            beams = candidates[: max(n, 1)]
        beams.sort(key=lambda c: (c[0], c[1]))
        return [list(seq) for _, seq, _ in beams[:n]]

    def generate_labels(
        self,
        prefix_vecs: np.ndarray,
        constraints: Optional[Sequence[str]] = None,
        num_return_sequences: int = 1,
        max_new_tokens: int = 15,
    ) -> List[str]:
        """Flat list of generated label strings, row-major —
        ``len == B * num_return_sequences`` (model.py:2133-2162).

        The generated sequences are a pure function of (prefix vector,
        constraint set, n, budget), and markerV0 span reps repeat
        heavily on Zipf-distributed corpora (same start/end token pair
        → same rep), so results are memoized per prefix-vector bytes —
        a hit skips the whole beam loop, bit-identically. The trie is
        likewise built once per constraint tuple."""
        ckey = tuple(constraints) if constraints else None
        tries = getattr(self, "_trie_cache", None)
        if tries is None:
            tries = self._trie_cache = {}
        trie = tries.get(ckey)
        if trie is None and ckey is not None:
            trie = tries[ckey] = build_labels_trie(constraints, self.tokenizer)
        cache = getattr(self, "_gen_cache", None)
        if cache is None:
            cache = self._gen_cache = {}
        out: List[str] = []
        for row in np.atleast_2d(prefix_vecs):
            key = (row.tobytes(), ckey, num_return_sequences, max_new_tokens)
            labels = cache.get(key)
            if labels is None:
                labels = [
                    self.tokenizer.decode(ids)
                    for ids in self.generate(
                        row,
                        max_new_tokens=max_new_tokens,
                        trie=trie,
                        num_return_sequences=num_return_sequences,
                    )
                ]
                if len(cache) >= 500_000:  # bound executor memory:
                    for k in list(cache)[: len(cache) // 2]:  # evict oldest half
                        del cache[k]
                cache[key] = labels
            out.extend(labels)
        return out


def build_span_label_map(
    sel_idx: Sequence[int], gen_labels: Sequence[str], num_gen_sequences: int
) -> Dict[int, List[str]]:
    """flat-span-index → generated labels, single-document case of
    SpanGenerativeDecoder._build_span_label_map_for_batch
    (decoding/decoder.py:446-490): span i's labels are the
    ``num_gen_sequences`` consecutive entries starting at
    ``i * num_gen_sequences``."""
    out: Dict[int, List[str]] = {}
    for i, flat_idx in enumerate(sel_idx):
        out[int(flat_idx)] = list(
            gen_labels[i * num_gen_sequences : (i + 1) * num_gen_sequences]
        )
    return out


def updated_id_to_classes(
    id_to_class: Dict[int, str], gen_labels: Sequence[str]
) -> Dict[int, str]:
    """Prompt mode: generated labels REPLACE the class names, single-
    document case of _update_id_to_classes_with_generated
    (decoding/decoder.py:415-444): class id k (1-based) maps to
    gen_labels[k-1]."""
    return {idx + 1: gen_labels[idx] for idx in range(len(id_to_class))}
