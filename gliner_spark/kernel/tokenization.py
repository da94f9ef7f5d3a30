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


def _offsets_by_scan(text: str, tokens) -> Iterator[Token]:
    """Reconstruct char offsets from a segmenter's token stream by
    forward-scanning the source — exactly how the reference recovers
    offsets for jieba/janome output (tokenizer.py:165-172, 198-207:
    ``text.find(token, last_idx)``). Whitespace-only tokens and tokens
    the scan can't locate are skipped."""
    last = 0
    for tok in tokens:
        if not tok or not tok.strip():
            continue
        start = text.find(tok, last)
        if start < 0:
            continue
        end = start + len(tok)
        last = end
        yield tok, start, end


def _make_zh_splitter():
    """Chinese: jieba3 (the reference's backend, tokenizer.py:174-208)
    or classic jieba as a fallback — both are pure-python."""
    try:
        import jieba3  # type: ignore

        tagger = jieba3.jieba3()
        return lambda text: _offsets_by_scan(text, tagger.cut_text(text))
    except ImportError:
        pass
    try:
        import jieba  # type: ignore

        return lambda text: _offsets_by_scan(text, jieba.cut(text))
    except ImportError:
        return None


def _make_ja_splitter():
    """Japanese: janome morphological analysis (tokenizer.py:139-172)."""
    try:
        from janome.tokenizer import Tokenizer  # type: ignore
    except ImportError:
        return None
    tok = Tokenizer()
    return lambda text: _offsets_by_scan(text, tok.tokenize(text, wakati=True))


def _make_ko_splitter():
    """Korean: mecab-ko morpheme segmentation (tokenizer.py:102-137)."""
    try:
        import mecab  # type: ignore
    except ImportError:
        return None
    tagger = mecab.MeCab()
    return lambda text: _offsets_by_scan(text, tagger.morphs(text))


_BACKEND_FACTORIES = {"zh": _make_zh_splitter, "ja": _make_ja_splitter, "ko": _make_ko_splitter}
_BACKEND_CACHE: dict = {}


def _language_backend(lang: str):
    """Import-gated per-language segmenter, cached per worker process.

    The cache also remembers misses so absent packages cost one failed
    import per process, not one per call."""
    if lang in _BACKEND_CACHE:
        return _BACKEND_CACHE[lang]
    factory = _BACKEND_FACTORIES.get(lang)
    backend = factory() if factory is not None else None
    _BACKEND_CACHE[lang] = backend
    return backend


def splitter_for_lang(lang: str = "en") -> Callable[[str], Iterator[Token]]:
    """Select a splitter by language code.

    Mirrors MultiLangWordsSplitter dispatch (tokenizer.py:334-404): the
    per-language backend when its package is importable (zh → jieba3/
    jieba, ja → janome, ko → mecab-ko), else the universal regex
    splitter — the reference's own fallback. The ``lang`` column of the
    pages table drives this per row, so mixed-language corpora tokenize
    correctly wherever the backends are shipped (``--py-files``) and
    deterministically fall back where they are not.
    """
    base = (lang or "en").lower().split("-")[0]  # zh-cn/zh-tw → zh (ref :365-367)
    return _language_backend(base) or _regex_splitter
