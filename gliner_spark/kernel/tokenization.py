"""Word tokenization with char offsets.

Replicates the reference's whitespace splitter semantics
(reference: gliner/data_processing/tokenizer.py:40-61 — regex
``\\w+(?:[-_]\\w+)*|\\S`` over unicode word chars, yielding
(token, char_start, char_end) with end exclusive) and the per-language
dispatch surface (tokenizer.py:518-581). The language-specific backends
in the reference (spaCy / stanza / janome / jieba / ...) are optional
heavy deps; here they are gated behind import-try with the universal
regex splitter as the documented fallback, so behavior is deterministic
in any environment.
"""

from __future__ import annotations

import re
from typing import Callable, Iterator, List, Tuple

# Exact pattern from the reference splitter (tokenizer.py:49).
# Python `re` treats \w as unicode word chars, matching the reference.
WORD_PATTERN = re.compile(r"\w+(?:[-_]\w+)*|\S")

Token = Tuple[str, int, int]


def word_tokenize(text: str) -> List[Token]:
    """Split ``text`` into (token, start, end) triples, end exclusive.

    Mirrors WhitespaceTokenSplitter.__call__ (tokenizer.py:51-61).
    """
    return [(m.group(), m.start(), m.end()) for m in WORD_PATTERN.finditer(text)]


def tokenize_with_offsets(text: str, lang: str = "en") -> Tuple[List[str], List[int], List[int]]:
    """Tokenize and return parallel (tokens, char_starts, char_ends) arrays.

    This is the per-row shape used throughout the pipeline — the direct
    analog of ``prepare_inputs`` (reference: gliner/model.py:1193-1208),
    which builds ``tokens`` plus start/end token→char maps.
    """
    splitter = splitter_for_lang(lang)
    tokens: List[str] = []
    starts: List[int] = []
    ends: List[int] = []
    for tok, s, e in splitter(text):
        tokens.append(tok)
        starts.append(s)
        ends.append(e)
    return tokens, starts, ends


def _regex_splitter(text: str) -> Iterator[Token]:
    for m in WORD_PATTERN.finditer(text):
        yield m.group(), m.start(), m.end()


def _try_language_backend(lang: str):
    """Optional language-specific splitters (reference tokenizer.py:64-515).

    Each heavy backend is import-gated; missing backends fall back to the
    universal regex splitter, which the reference also uses as default.
    """
    try:
        if lang == "ja":
            from janome.tokenizer import Tokenizer  # noqa: F401  pragma: no cover
        elif lang == "zh":
            import jieba  # noqa: F401  pragma: no cover
        elif lang == "ko":
            import konlpy  # noqa: F401  pragma: no cover
        else:
            return None
    except ImportError:
        return None
    return None  # backends intentionally unused in this environment


def splitter_for_lang(lang: str = "en") -> Callable[[str], Iterator[Token]]:
    """Select a splitter by language code.

    Mirrors MultiLangWordsSplitter dispatch (tokenizer.py:334-404): a
    per-language backend when available, else the universal regex. In
    this build every language resolves to the regex splitter (the
    reference's own default), keeping outputs deterministic everywhere.
    """
    _try_language_backend(lang)
    return _regex_splitter
