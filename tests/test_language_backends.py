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
