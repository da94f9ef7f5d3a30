"""Block-diagonal sequence packing (X2) — numpy port of the reference's
inference packing (gliner/infer_packing.py):

* first-fit stream packing (:164-208): each request goes into the first
  stream with remaining capacity ≤ max_length, preserving arrival
  order; over-long requests are truncated to max_length first;
* per-token segment ids (:213-239): 1-based per packed request, 0 for
  padding;
* block-diagonal pair mask (:81-96): position i may attend j iff they
  share a segment id — packing is output-identical to unpacked
  inference exactly when the encoder honors this mask (the reference
  proves identity in bench/bench_gliner_e2e.py:241-248; our
  tests/test_packing.py proves it against a mixing mock encoder);
* unpack (:354-415): slice each request's positions back out of its
  stream.

This is the full version of the reference's headline throughput
optimization (padding elimination); the cheap 80% variant — sorting
rows by token length so padded batches are length-homogeneous — lives
in the batched pipeline path and plans/skew.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence

import numpy as np


@dataclass
class InferencePackingConfig:
    """Packing knobs (infer_packing.py:21-33, verbatim fields).

    ``max_length``: token capacity of one packed stream;
    ``sep_token_id``: reserved (unused in the reference too);
    ``streams_per_batch``: streams per model call — the session batch's
    token budget is max_length × streams_per_batch.
    """

    max_length: int
    sep_token_id: int | None = None
    streams_per_batch: int = 1


@dataclass
class PackedBatch:
    """Packed streams + the bookkeeping needed to unpack."""

    input_ids: np.ndarray  # (n_streams, L) int64, pad_id padded
    attention_mask: np.ndarray  # (n_streams, L) int64, 1 on real tokens
    segment_ids: np.ndarray  # (n_streams, L) int64, 0 = padding
    # per original request, in arrival order:
    stream_of: List[int] = field(default_factory=list)
    offset_of: List[int] = field(default_factory=list)
    length_of: List[int] = field(default_factory=list)


def first_fit_pack(lengths: Sequence[int], max_length: int) -> List[List[int]]:
    """First-fit stream assignment (infer_packing.py:164-208): request i
    (clamped to max_length) joins the first stream that still fits.
    Returns streams as lists of request indices in packing order."""
    if max_length <= 0:
        raise ValueError("max_length must be positive")
    streams: List[List[int]] = []
    used: List[int] = []
    for idx, raw_len in enumerate(lengths):
        n = min(int(raw_len), max_length)
        for s, total in enumerate(used):
            if total + n <= max_length:
                streams[s].append(idx)
                used[s] = total + n
                break
        else:
            streams.append([idx])
            used.append(n)
    return streams


def pack_batch(
    token_lists: Sequence[Sequence[int]], max_length: int, pad_id: int = 0
) -> PackedBatch:
    """Pack token id sequences into streams (pack_requests analog,
    infer_packing.py:238-326)."""
    truncated = [list(t)[:max_length] for t in token_lists]
    streams = first_fit_pack([len(t) for t in truncated], max_length)
    n = len(streams)
    width = max((sum(len(truncated[i]) for i in s) for s in streams), default=0)
    input_ids = np.full((n, width), pad_id, dtype=np.int64)
    attention = np.zeros((n, width), dtype=np.int64)
    segment_ids = np.zeros((n, width), dtype=np.int64)
    stream_of = [0] * len(truncated)
    offset_of = [0] * len(truncated)
    length_of = [0] * len(truncated)
    for s, members in enumerate(streams):
        cursor = 0
        for seg_id, idx in enumerate(members, start=1):
            toks = truncated[idx]
            L = len(toks)
            input_ids[s, cursor : cursor + L] = toks
            attention[s, cursor : cursor + L] = 1
            segment_ids[s, cursor : cursor + L] = seg_id
            stream_of[idx] = s
            offset_of[idx] = cursor
            length_of[idx] = L
            cursor += L
    return PackedBatch(input_ids, attention, segment_ids, stream_of, offset_of, length_of)


def block_diag_mask(segment_ids: np.ndarray) -> np.ndarray:
    """(B, L) segment ids → (B, L, L) bool pair mask: attend iff same
    segment (block_diag_mask, infer_packing.py:81-96). Padding positions
    (segment 0) form their own block, exactly like the reference — the
    attention mask already excludes them from real computation."""
    return segment_ids[:, :, None] == segment_ids[:, None, :]


def unpack_hidden(hidden: np.ndarray, packed: PackedBatch) -> List[np.ndarray]:
    """(n_streams, L, ...) stream outputs → per-request slices in the
    original arrival order (unpack, infer_packing.py:354-415)."""
    return [
        hidden[packed.stream_of[i], packed.offset_of[i] : packed.offset_of[i] + packed.length_of[i]]
        for i in range(len(packed.stream_of))
    ]
