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


def _make_ar_splitter():
    """Arabic: CAMeL Tools simple word tokenize (tokenizer.py:210-245)."""
    try:
        from camel_tools.tokenizers.word import simple_word_tokenize  # type: ignore
    except ImportError:
        return None
    return lambda text: _offsets_by_scan(text, simple_word_tokenize(text))


def _offsets_by_regex_scan(text: str, tokens) -> Iterator[Token]:
    """The HindiSplitter offset recovery (tokenizer.py:265-286):
    ``re.search(re.escape(token), text[last:])`` instead of str.find —
    behavioral parity kept separate from _offsets_by_scan because the
    two differ on tokens the segmenter normalized away."""
    last = 0
    for tok in tokens:
        if not tok:
            continue
        m = re.search(re.escape(tok), text[last:])
        if m is None:
            continue
        start = last + m.start()
        end = start + len(tok)
        last = end
        yield tok, start, end


def _make_hi_splitter():
    """Hindi: Indic NLP trivial tokenize (tokenizer.py:247-286)."""
    try:
        from indicnlp.tokenize import indic_tokenize  # type: ignore
    except ImportError:
        return None
    return lambda text: _offsets_by_regex_scan(
        text, indic_tokenize.trivial_tokenize(text, lang="hi")
    )


def _make_spacy_splitter(lang: str = "xx"):
    """spaCy blank-model tokenizer (SpaCyTokenSplitter, tokenizer.py:64-100);
    ``xx`` = the universal multi-language blank pipeline."""
    try:
        import spacy  # type: ignore

        nlp = spacy.blank(lang)
    except Exception:
        return None
    return lambda text: (
        (t.text, t.idx, t.idx + len(t.text)) for t in nlp(text) if t.text.strip()
    )


def _make_hanlp_splitter(model_name: str = "FINE_ELECTRA_SMALL_ZH"):
    """HanLP Chinese segmentation (HanLPTokenSplitter, tokenizer.py:288-332)."""
    try:
        import hanlp  # type: ignore
        import hanlp.pretrained  # type: ignore

        models = hanlp.pretrained.tok.ALL
        if model_name not in models:
            raise ValueError(
                f"HanLP: {model_name} not available, choose from {list(models)}"
            )
        tagger = hanlp.load(models[model_name])
    except ImportError:
        return None
    return lambda text: _offsets_by_scan(text, tagger(text))


def _make_stanza_splitter(default_lang: str = "en"):
    """Stanza tokenization (StanzaWordsSplitter, tokenizer.py:406-515);
    emits the model's own char offsets, not a scan reconstruction."""
    try:
        import stanza  # type: ignore
    except ImportError:
        return None
    pipelines: dict = {}

    def split(text: str) -> Iterator[Token]:
        pipe = pipelines.get(default_lang)
        if pipe is None:
            pipe = stanza.Pipeline(
                lang=default_lang, processors="tokenize", verbose=False
            )
            pipelines[default_lang] = pipe
        for sentence in pipe(text).sentences:
            for word in sentence.words:
                yield word.text, word.start_char, word.end_char

    return split


_BACKEND_FACTORIES = {
    "zh": _make_zh_splitter,
    "ja": _make_ja_splitter,
    "ko": _make_ko_splitter,
    "ar": _make_ar_splitter,
    "hi": _make_hi_splitter,
}
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


# ---------------------------------------------------------------------------
# universal auto-detect + explicit splitter factory
# ---------------------------------------------------------------------------


def _detect_lang(text: str) -> str:
    """Language detection for the universal splitter.

    langdetect (the reference's detector, seeded for determinism,
    tokenizer.py:353-358) when importable; otherwise a dependency-free
    deterministic heuristic: script-range counting for CJK/Arabic/
    Devanagari/Hangul (the languages whose splitters differ), else
    'en'. Detection only chooses a SPLITTER, so the fallback's coarse
    granularity is exactly as wrong as the universal regex fallback it
    routes to.
    """
    try:
        from langdetect import DetectorFactory, detect  # type: ignore
        from langdetect.lang_detect_exception import LangDetectException  # type: ignore

        DetectorFactory.seed = 0  # ref tokenizer.py:356
        try:
            return detect(text)
        except LangDetectException:
            return "unknown"
    except ImportError:
        pass
    counts = {"zh": 0, "ja": 0, "ko": 0, "ar": 0, "hi": 0}
    for ch in text:
        o = ord(ch)
        if 0x4E00 <= o <= 0x9FFF:
            counts["zh"] += 1
        elif 0x3040 <= o <= 0x30FF:
            counts["ja"] += 1
        elif 0xAC00 <= o <= 0xD7AF:
            counts["ko"] += 1
        elif 0x0600 <= o <= 0x06FF:
            counts["ar"] += 1
        elif 0x0900 <= o <= 0x097F:
            counts["hi"] += 1
    best = max(counts, key=lambda k: (counts[k], k))
    # kana implies Japanese even with many kanji (zh-range) characters
    if counts["ja"] > 0 and best == "zh":
        best = "ja"
    return best if counts[best] > 0 else "en"


def _universal_splitter(text: str) -> Iterator[Token]:
    """MultiLangWordsSplitter analog (tokenizer.py:334-404): detect the
    language per call, dispatch to its backend when importable, fall
    back to the universal regex splitter."""
    lang = _detect_lang(text)
    return splitter_for_lang(lang)(text)


_SPLITTER_TYPES = (
    "universal", "whitespace", "spacy", "mecab", "jieba", "hanlp",
    "janome", "camel", "hindi", "stanza",
)


def words_splitter(splitter_type: str = "whitespace") -> Callable[[str], Iterator[Token]]:
    """Explicit splitter factory — the WordsSplitter dispatch surface
    (tokenizer.py:518-581). Unlike the per-row ``lang``-column dispatch
    (which silently falls back so mixed corpora always tokenize), an
    EXPLICITLY requested backend whose package is missing raises
    ModuleNotFoundError, matching the reference's constructors."""
    if splitter_type == "universal":
        return _universal_splitter
    if splitter_type == "whitespace":
        return _regex_splitter
    factories = {
        "spacy": _make_spacy_splitter,
        "mecab": _make_ko_splitter,
        "jieba": _make_zh_splitter,
        "hanlp": _make_hanlp_splitter,
        "janome": _make_ja_splitter,
        "camel": _make_ar_splitter,
        "hindi": _make_hi_splitter,
        "stanza": _make_stanza_splitter,
    }
    factory = factories.get(splitter_type)
    if factory is None:
        raise ValueError(
            f"{splitter_type!r} is not implemented, choose between {_SPLITTER_TYPES}"
        )
    splitter = factory()
    if splitter is None:
        raise ModuleNotFoundError(
            f"backend package for splitter_type={splitter_type!r} is not "
            f"installed (ship it via --py-files / the cluster image)"
        )
    return splitter
