"""Word-mask construction (T4): subtoken → 1-indexed word positions.

Re-implements the reference's ``prepare_word_mask``
(gliner/data_processing/utils.py:95-179) over plain word-id lists
instead of a HuggingFace tokenization object — the shape that crosses
an Arrow batch. Semantics (differential-tested against the reference
in tests/test_reference_parity.py):

* ``None`` word id (special tokens) → 0
* first subtoken of each word → running 1-based word index, where the
  first ``skip_first`` words (prompt tokens) map to 0 and indexing
  restarts after them
* continuation subtokens → 0, unless ``token_level`` (then every
  subtoken of a surviving word gets the index)
"""

from __future__ import annotations

from typing import List, Optional, Sequence


def word_mask(
    word_ids: Sequence[Optional[int]],
    skip_first: int = 0,
    token_level: bool = False,
) -> List[int]:
    """Mask for ONE subtoken sequence."""
    mask: List[int] = []
    prev: Optional[int] = None
    seen = 0
    for wid in word_ids:
        if wid is None:
            mask.append(0)
        elif wid != prev or token_level:
            if wid != prev:
                seen += 1
            mask.append(0 if seen <= skip_first else seen - skip_first)
        else:
            mask.append(0)
        prev = wid
    return mask


def word_masks(
    word_ids_per_seq: Sequence[Sequence[Optional[int]]],
    skip_first_words: Optional[Sequence[int]] = None,
    token_level: bool = False,
) -> List[List[int]]:
    """Batch form; ``skip_first_words`` parallels the sequences."""
    n = len(word_ids_per_seq)
    skips = list(skip_first_words) if skip_first_words is not None else [0] * n
    if len(skips) != n:
        raise ValueError("skip_first_words must have same length as inputs")
    return [
        word_mask(wids, skips[i], token_level)
        for i, wids in enumerate(word_ids_per_seq)
    ]
