"""Labels trie for constrained label generation (D10).

Prefix trie over token-id sequences driving trie-constrained decoding,
matching the reference's semantics (gliner/decoding/trie/
python_labels_trie.py, itself a port of trie.cpp):

* children are kept in INSERTION order — ``get`` returns possible next
  keys in the order the entities were added (the C++ code iterates a
  vector; the constrained-decoding mask is order-insensitive, but the
  n-best expansion in our deterministic head is not, so order is
  contractual here too);
* nodes created by the constructor are PERMANENT: ``remove_entity``
  walks the branch bottom-up and stops at the first node that still has
  children or is permanent, so removing a dynamically-added label never
  truncates a constructor-installed one that shares a prefix;
* ``get`` on a prefix that falls off the trie returns [] (the decoder
  maps that to [eos]).

Pure Python, no Spark imports — the trie is built driver-side from the
constraint label set and shipped in the task closure (a few KB for even
thousands of labels).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence


class _Node:
    __slots__ = ("key", "permanent", "children")

    def __init__(self, key: int, permanent: bool):
        self.key = key
        self.permanent = permanent
        # dicts preserve insertion order → vector-like child iteration
        self.children: Dict[int, "_Node"] = {}


class LabelsTrie:
    """Token-sequence prefix trie with permanence-aware removal."""

    def __init__(self, entities: Optional[Sequence[Sequence[int]]] = None):
        self._root = _Node(0, True)
        if entities:
            for ent in entities:
                self._add(ent, permanent=True)

    # -- insertion ----------------------------------------------------
    def _add(self, entity: Sequence[int], permanent: bool) -> None:
        cur = self._root
        for tok in entity:
            nxt = cur.children.get(tok)
            if nxt is None:
                nxt = _Node(tok, permanent)
                cur.children[tok] = nxt
            cur = nxt

    def add(self, tokens: Sequence[int]) -> None:
        """Add one sequence (non-permanent, like the reference's add)."""
        self._add(tokens, permanent=False)

    def add_batch(self, entities: Sequence[Sequence[int]]) -> None:
        for ent in entities:
            self._add(ent, permanent=False)

    # -- lookup -------------------------------------------------------
    def get(self, prefix: Sequence[int]) -> List[int]:
        """Possible next token ids after ``prefix`` (insertion order);
        [] when the prefix is not in the trie or is a leaf."""
        cur = self._root
        for tok in prefix:
            cur = cur.children.get(tok)
            if cur is None:
                return []
        return list(cur.children.keys())

    # -- removal ------------------------------------------------------
    def _branch(self, entity: Sequence[int]) -> List[_Node]:
        branch = [self._root]
        cur = self._root
        for tok in entity:
            cur = cur.children.get(tok)
            if cur is None:
                return []
            branch.append(cur)
        return branch

    def remove_entity(self, tokens: Sequence[int]) -> None:
        """Remove one sequence; prunes bottom-up, stopping at nodes that
        still have children or were installed by the constructor."""
        branch = self._branch(tokens)
        if len(branch) <= 1:
            return
        for child, parent in zip(reversed(branch[1:]), reversed(branch[:-1])):
            if child.children or child.permanent:
                break
            parent.children.pop(child.key, None)

    def remove_batch(self, entities: Sequence[Sequence[int]]) -> None:
        for ent in entities:
            self.remove_entity(ent)
