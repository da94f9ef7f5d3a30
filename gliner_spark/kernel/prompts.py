"""Prompt construction.

Replicates the reference's prompt prepend operators:
- entity prompt ``[<<ENT>>, t1, <<ENT>>, t2, ..., <<SEP>>] + tokens``
  (gliner/data_processing/processor.py:152-197)
- relex prompt adds a ``<<REL>>, r1, ..., <<SEP>>`` block
  (processor.py:1813-1859)

Special tokens pinned to the reference defaults
(gliner/config.py:35-36, 197).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

ENT_TOKEN = "<<ENT>>"
SEP_TOKEN = "<<SEP>>"
REL_TOKEN = "<<REL>>"


def build_entity_prompt(tokens: Sequence[str], labels: Sequence[str]) -> Tuple[List[str], int]:
    """Return (prompt + tokens, prompt_length).

    Mirrors processor.py:179-197: one ``<<ENT>> label`` pair per label,
    closed by ``<<SEP>>``; prompt_length counts prompt tokens only.
    """
    prompt: List[str] = []
    for label in labels:
        prompt.append(ENT_TOKEN)
        prompt.append(str(label))
    prompt.append(SEP_TOKEN)
    return prompt + list(tokens), len(prompt)


def build_relex_prompt(
    tokens: Sequence[str], labels: Sequence[str], relations: Sequence[str]
) -> Tuple[List[str], int]:
    """Entity block then relation block, each ``<<SEP>>``-terminated.

    Mirrors processor.py:1846-1858 (relex collator path).
    """
    prompt: List[str] = []
    for label in labels:
        prompt.append(ENT_TOKEN)
        prompt.append(str(label))
    prompt.append(SEP_TOKEN)
    for rel in relations:
        prompt.append(REL_TOKEN)
        prompt.append(str(rel))
    prompt.append(SEP_TOKEN)
    return prompt + list(tokens), len(prompt)
