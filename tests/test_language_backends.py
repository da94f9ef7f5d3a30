"""Language-backend dispatch (P2) — the lang column must actually change
tokenization when a backend is present (reference MultiLangWordsSplitter,
tokenizer.py:334-404). Backends aren't installed in this sandbox, so a
fake jieba3 module is injected to prove the wiring end to end."""

import sys
import types

import pytest

from gliner_spark.kernel import tokenization as tk


@pytest.fixture
def fake_jieba3(monkeypatch):
    """A jieba3 stand-in with the reference-used surface:
    jieba3.jieba3().cut_text(text) → list of segments."""

    class _Tagger:
        def cut_text(self, text):
            # split on '|' markers to simulate dictionary segmentation
            return [seg for seg in text.split("|")]

    mod = types.ModuleType("jieba3")
    mod.jieba3 = _Tagger
    monkeypatch.setitem(sys.modules, "jieba3", mod)
    monkeypatch.setattr(tk, "_BACKEND_CACHE", {})
    yield mod
    monkeypatch.setattr(tk, "_BACKEND_CACHE", {})


class TestBackendDispatch:
    def test_zh_uses_backend_when_available(self, fake_jieba3):
        text = "云计算|平台|运行"
        tokens, starts, ends = tk.tokenize_with_offsets(text, "zh")
        assert tokens == ["云计算", "平台", "运行"]
        # byte-identical offset invariant holds for backend output too
        for t, s, e in zip(tokens, starts, ends):
            assert text[s:e] == t

    def test_zh_variants_normalize(self, fake_jieba3):
        a = tk.tokenize_with_offsets("阿里|云", "zh-cn")
        b = tk.tokenize_with_offsets("阿里|云", "zh")
        assert a == b

    def test_en_unaffected_by_backend(self, fake_jieba3):
        text = "plain english text"
        assert tk.tokenize_with_offsets(text, "en")[0] == ["plain", "english", "text"]

    def test_zh_differs_from_en_tokenization(self, fake_jieba3):
        text = "云计算|平台"
        zh = tk.tokenize_with_offsets(text, "zh")[0]
        en = tk.tokenize_with_offsets(text, "en")[0]
        assert zh != en  # the lang column changes behavior

    def test_missing_backend_falls_back_to_regex(self, monkeypatch):
        monkeypatch.setattr(tk, "_BACKEND_CACHE", {})
        for name in ("jieba3", "jieba"):
            monkeypatch.setitem(sys.modules, name, None)  # force ImportError
        tokens, _, _ = tk.tokenize_with_offsets("hello 世界", "zh")
        ref = tk.tokenize_with_offsets("hello 世界", "en")[0]
        assert tokens == ref

    def test_miss_cached_once(self, monkeypatch):
        calls = []
        monkeypatch.setattr(tk, "_BACKEND_CACHE", {})
        orig = tk._make_zh_splitter
        monkeypatch.setitem(
            tk._BACKEND_FACTORIES, "zh", lambda: calls.append(1) or orig()
        )
        tk.splitter_for_lang("zh")
        tk.splitter_for_lang("zh")
        assert len(calls) == 1

    def test_offsets_scan_skips_whitespace_and_unfindable(self):
        out = list(tk._offsets_by_scan("a b c", ["a", " ", "x", "b", "c"]))
        assert out == [("a", 0, 1), ("b", 2, 3), ("c", 4, 5)]


def _module_tree(monkeypatch, dotted: str, leaf_attrs: dict):
    """Install a fake package chain so `from a.b.c import f` works."""
    parts = dotted.split(".")
    for i in range(1, len(parts) + 1):
        name = ".".join(parts[:i])
        mod = sys.modules.get(name)
        if not isinstance(mod, types.ModuleType) or i == len(parts):
            mod = types.ModuleType(name)
            monkeypatch.setitem(sys.modules, name, mod)
        if i == len(parts):
            for k, v in leaf_attrs.items():
                setattr(mod, k, v)
        if i > 1:
            setattr(sys.modules[".".join(parts[: i - 1])], parts[i - 1], mod)


class TestNewBackends:
    """ar/hi backends + the regex-scan offset recovery (tokenizer.py
    :210-286) through fake packages — proves the wiring, not the libs."""

    def test_ar_camel_backend(self, monkeypatch):
        monkeypatch.setattr(tk, "_BACKEND_CACHE", {})
        _module_tree(
            monkeypatch, "camel_tools.tokenizers.word",
            {"simple_word_tokenize": lambda text: text.split("|")},
        )
        text = "كلمة|أخرى"
        tokens, starts, ends = tk.tokenize_with_offsets(text, "ar")
        assert tokens == ["كلمة", "أخرى"]
        for t, s, e in zip(tokens, starts, ends):
            assert text[s:e] == t

    def test_hi_indic_backend(self, monkeypatch):
        monkeypatch.setattr(tk, "_BACKEND_CACHE", {})

        class _IT:
            @staticmethod
            def trivial_tokenize(text, lang="hi"):
                return text.split("|")

        _module_tree(monkeypatch, "indicnlp.tokenize", {"indic_tokenize": _IT})
        text = "नमस्ते|दुनिया"
        tokens, starts, ends = tk.tokenize_with_offsets(text, "hi")
        assert tokens == ["नमस्ते", "दुनिया"]
        for t, s, e in zip(tokens, starts, ends):
            assert text[s:e] == t

    def test_regex_scan_matches_reference_semantics(self):
        # tokens containing regex metacharacters must be escaped
        out = list(tk._offsets_by_regex_scan("a+b a+b", ["a+b", "a+b"]))
        assert out == [("a+b", 0, 3), ("a+b", 4, 7)]


class TestUniversalSplitter:
    """MultiLangWordsSplitter analog: detect → backend dispatch →
    regex fallback (tokenizer.py:334-404)."""

    def test_detect_prefers_langdetect_when_present(self, monkeypatch):
        calls = []

        class _Factory:
            seed = None

        def detect(text):
            calls.append(text)
            return "zh"

        _module_tree(monkeypatch, "langdetect", {
            "DetectorFactory": _Factory, "detect": detect,
        })

        class _Exc(Exception):
            pass

        _module_tree(
            monkeypatch, "langdetect.lang_detect_exception",
            {"LangDetectException": _Exc},
        )
        assert tk._detect_lang("whatever") == "zh"
        assert calls and _Factory.seed == 0  # seeded like the reference

    def test_script_heuristic_fallback(self):
        # no langdetect in the sandbox → script-range routing
        assert tk._detect_lang("云计算平台运行良好") == "zh"
        assert tk._detect_lang("これはテストです") == "ja"
        assert tk._detect_lang("안녕하세요 세계") == "ko"
        assert tk._detect_lang("مرحبا بالعالم") == "ar"
        assert tk._detect_lang("नमस्ते दुनिया") == "hi"
        assert tk._detect_lang("plain english text") == "en"

    def test_universal_routes_to_backend(self, fake_jieba3):
        text = "云计算|平台"
        out = [t for t, _s, _e in tk._universal_splitter(text)]
        assert out == ["云计算", "平台"]

    def test_universal_falls_back_to_regex(self):
        text = "plain english text"
        assert [t for t, _s, _e in tk._universal_splitter(text)] == [
            "plain", "english", "text",
        ]


class TestWordsSplitterFactory:
    """WordsSplitter dispatch surface (tokenizer.py:518-581)."""

    def test_whitespace_and_universal_always_available(self):
        ws = tk.words_splitter("whitespace")
        assert [t for t, _s, _e in ws("a b")] == ["a", "b"]
        assert [t for t, _s, _e in tk.words_splitter("universal")("a b")] == ["a", "b"]

    def test_unknown_type_raises_value_error(self):
        with pytest.raises(ValueError):
            tk.words_splitter("nope")

    def test_missing_backend_raises_module_not_found(self, monkeypatch):
        for name in ("jieba3", "jieba"):
            monkeypatch.setitem(sys.modules, name, None)
        with pytest.raises(ModuleNotFoundError):
            tk.words_splitter("jieba")

    def test_explicit_backend_dispatch(self, fake_jieba3):
        jb = tk.words_splitter("jieba")
        assert [t for t, _s, _e in jb("云计算|平台")] == ["云计算", "平台"]
