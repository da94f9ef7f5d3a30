"""Word-span → char-offset mapping and output formatting.

Replicates `_map_entities_to_original` (gliner/model.py:1281-1331) and
`_process_relations` (gliner/model.py:2615-2699). The per-row invariant
the whole pipeline guarantees: ``entity["text"] ==
text[entity["start"]:entity["end"]]`` — byte-identical extracted text.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

from .decoding import Span


def map_spans_to_char(
    spans: Sequence[Span],
    text: str,
    char_starts: Sequence[int],
    char_ends: Sequence[int],
) -> List[Dict[str, Any]]:
    """Word-level spans → char-level entity dicts (model.py:1303-1329)."""
    entities: List[Dict[str, Any]] = []
    for span in spans:
        s = char_starts[span.start]
        e = char_ends[span.end]
        ent: Dict[str, Any] = {
            "start": s,
            "end": e,
            "text": text[s:e],
            "label": span.entity_type,
            "score": span.score,
        }
        if span.class_probs is not None:
            ent["class_probs"] = span.class_probs
        entities.append(ent)
    return entities


def format_relations(
    rel_tuples: Sequence[Tuple[int, str, int, float]],
    spans: Sequence[Span],
    text: str,
    char_starts: Sequence[int],
    char_ends: Sequence[int],
) -> List[Dict[str, Any]]:
    """Relation tuples → head/tail/relation dicts (model.py:2615-2699).

    head_idx/tail_idx index into the post-greedy ``spans`` list;
    out-of-range indices are skipped (model.py:2663).
    """
    relations: List[Dict[str, Any]] = []
    for head_idx, rel_label, tail_idx, score in rel_tuples:
        if head_idx >= len(spans) or tail_idx >= len(spans):
            continue
        head, tail = spans[head_idx], spans[tail_idx]
        hs, he = char_starts[head.start], char_ends[head.end]
        ts, te = char_starts[tail.start], char_ends[tail.end]
        relations.append(
            {
                "head": {
                    "start": hs,
                    "end": he,
                    "text": text[hs:he],
                    "type": head.entity_type,
                    "entity_idx": head_idx,
                },
                "tail": {
                    "start": ts,
                    "end": te,
                    "text": text[ts:te],
                    "type": tail.entity_type,
                    "entity_idx": tail_idx,
                },
                "relation": rel_label,
                "score": score,
            }
        )
    return relations
