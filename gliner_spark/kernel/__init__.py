"""Pure-Python/numpy parity kernels. No Spark imports allowed here.

These functions replicate, bit-for-bit, the decision logic of the
reference GLiNER library (see file:line citations in each module) so the
distributed pipeline's per-row outputs match the reference's.
"""

from .tokenization import word_tokenize, WORD_PATTERN, splitter_for_lang
from .spans import prepare_span_idx, make_mapping
from .prompts import build_entity_prompt, build_relex_prompt, ENT_TOKEN, SEP_TOKEN, REL_TOKEN
from .labels_trie import LabelsTrie
from .decoding import (
    Span,
    has_overlapping,
    has_overlapping_nested,
    is_nested,
    greedy_search,
    decode_span_probs,
    decode_token_scores,
    decode_relations,
)
from .charmap import map_spans_to_char, format_relations
from .wordmask import word_mask, word_masks
from .packing import (
    PackedBatch,
    block_diag_mask,
    first_fit_pack,
    pack_batch,
    unpack_hidden,
)

__all__ = [
    "LabelsTrie",
    "word_tokenize",
    "WORD_PATTERN",
    "splitter_for_lang",
    "prepare_span_idx",
    "make_mapping",
    "build_entity_prompt",
    "build_relex_prompt",
    "ENT_TOKEN",
    "SEP_TOKEN",
    "REL_TOKEN",
    "Span",
    "has_overlapping",
    "has_overlapping_nested",
    "is_nested",
    "greedy_search",
    "decode_span_probs",
    "decode_token_scores",
    "decode_relations",
    "map_spans_to_char",
    "format_relations",
    "word_mask",
    "word_masks",
    "PackedBatch",
    "block_diag_mask",
    "first_fit_pack",
    "pack_batch",
    "unpack_hidden",
]
