"""Span enumeration and label mappings.

Replicates gliner/data_processing/utils.py:182-252 (`make_mapping`,
`prepare_span_idx`).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def make_mapping(types: List[str]) -> Tuple[Dict[str, int], Dict[int, str]]:
    """Order-preserving de-dup → 1-indexed bidirectional label maps.

    Mirrors data_processing/utils.py:182-212: IDs start from 1,
    0 is reserved for padding/no-label.
    """
    uniq = list(dict.fromkeys(types))
    fwd = {k: i for i, k in enumerate(uniq, start=1)}
    rev = {v: k for k, v in fwd.items()}
    return fwd, rev


def prepare_span_idx(num_tokens: int, max_width: int) -> List[Tuple[int, int]]:
    """All (start, start+j) pairs for j in [0, max_width).

    Mirrors data_processing/utils.py:215-252. End is inclusive; spans may
    run past the sequence (validity is checked at decode time, matching
    the reference's `_is_valid_span`, decoder.py:144-157).
    """
    return [(i, i + j) for i in range(num_tokens) for j in range(max_width)]


def span_idx_array(num_tokens: int, max_width: int) -> np.ndarray:
    """Vectorized (L*K, 2) int array version of prepare_span_idx."""
    starts = np.repeat(np.arange(num_tokens), max_width)
    widths = np.tile(np.arange(max_width), num_tokens)
    return np.stack([starts, starts + widths], axis=1)
