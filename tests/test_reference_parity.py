"""TRUE differential parity: run the REFERENCE's own pure-Python logic
(loaded module-by-module from /root/reference, bypassing its package
__init__ and stubbing the unused torch import) against our kernels on
the same inputs. This is the strongest parity evidence available
without torch: the decision functions themselves, not re-derived
expectations.

Covers: overlap predicates (decoding/utils.py), greedy overlap
resolution (decoder.py:74-116), whitespace tokenizer regex
(data_processing/tokenizer.py:40-61).
"""

import importlib.util
import random
import sys
import types

import pytest

import gliner_spark.kernel.decoding as ours
from gliner_spark.kernel.tokenization import word_tokenize

REF = "/root/reference/gliner"


def _load(name: str, path: str, package: str | None = None):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    if package:
        mod.__package__ = package
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    """Load reference modules with a stub package skeleton + fake torch."""
    created = []

    def fake_pkg(name):
        m = types.ModuleType(name)
        m.__path__ = []
        sys.modules[name] = m
        created.append(name)
        return m

    fake_pkg("refg")
    u = types.ModuleType("refg.utils")
    u.is_module_available = lambda _n: False
    sys.modules["refg.utils"] = u
    created.append("refg.utils")
    fake_pkg("refg.decoding")
    fake_pkg("refg.data_processing")
    if "torch" not in sys.modules:
        class _TorchStub(types.ModuleType):
            # class-body annotations reference torch.Tensor etc. at
            # import time; any attribute resolves to a dummy type
            def __getattr__(self, name):
                return type(name, (), {})

        sys.modules["torch"] = _TorchStub("torch")
        created.append("torch")

    try:
        dec_utils = _load(
            "refg.decoding.utils", f"{REF}/decoding/utils.py", "refg.decoding"
        )
        decoder = _load(
            "refg.decoding.decoder", f"{REF}/decoding/decoder.py", "refg.decoding"
        )
        tokenizer = _load(
            "refg.data_processing.tokenizer",
            f"{REF}/data_processing/tokenizer.py",
            "refg.data_processing",
        )
    except Exception as e:  # reference layout changed → skip, don't fail
        for n in created:
            sys.modules.pop(n, None)
        pytest.skip(f"reference modules not loadable: {e!r}")
    yield types.SimpleNamespace(
        utils=dec_utils, decoder=decoder, tokenizer=tokenizer
    )
    for n in created:
        sys.modules.pop(n, None)


class TestOverlapPredicateParity:
    def test_exhaustive_small_grid(self, ref):
        spans = [
            (a, b, lab)
            for a in range(4)
            for b in range(a, 5)
            for lab in ("X", "Y")
        ]
        for s1 in spans:
            for s2 in spans:
                for ml in (False, True):
                    assert ours.is_nested(s1, s2) == ref.utils.is_nested(s1, s2)
                    assert ours.has_overlapping(s1, s2, ml) == \
                        ref.utils.has_overlapping(s1, s2, ml), (s1, s2, ml)
                    assert ours.has_overlapping_nested(s1, s2, ml) == \
                        ref.utils.has_overlapping_nested(s1, s2, ml), (s1, s2, ml)


class TestGreedySearchParity:
    def _random_spans(self, rng, n):
        out_ours, out_ref = [], []
        for _ in range(n):
            s = rng.randrange(0, 30)
            e = s + rng.randrange(0, 6)
            lab = rng.choice(["A", "B", "C"])
            # scores from a tiny value set → frequent exact ties, the
            # stable-sort order is exactly what must match
            score = rng.choice([0.3, 0.5, 0.5, 0.7, 0.9])
            out_ours.append(ours.Span(s, e, lab, score))
            out_ref.append(ref_span := self._ref_span(s, e, lab, score))
        return out_ours, out_ref

    def _ref_span(self, s, e, lab, score):
        return self._ref_cls(start=s, end=e, entity_type=lab, score=score)

    def test_many_random_cases_tie_heavy(self, ref):
        self._ref_cls = ref.decoder.Span

        # greedy_search touches no instance state — call it unbound
        class _Dec:
            greedy_search = ref.decoder.BaseDecoder.greedy_search

        dec = _Dec()
        rng = random.Random(1234)
        for flat in (True, False):
            for ml in (False, True):
                for _case in range(150):
                    a, b = self._random_spans(rng, rng.randrange(0, 12))
                    got = ours.greedy_search(a, flat_ner=flat, multi_label=ml)
                    exp = dec.greedy_search(b, flat_ner=flat, multi_label=ml)
                    assert [
                        (x.start, x.end, x.entity_type, x.score) for x in got
                    ] == [
                        (x.start, x.end, x.entity_type, x.score) for x in exp
                    ], (flat, ml)


class TestTokenizerParity:
    CASES = [
        "simple words here",
        "hyphen-ated and under_scored compounds stay whole",
        "punct! marks? split; into, single. tokens:",
        "unicode — dashes … and “quotes” précisément 東京 niño",
        "  leading and   multiple   spaces ",
        "tabs\tand\nnewlines mix",
        "numbers 123 mixed a1b2 and 3-4_5",
        "",
    ]

    def test_whitespace_splitter_identical(self, ref):
        splitter = ref.tokenizer.WhitespaceTokenSplitter()
        for text in self.CASES:
            exp = [(t, s, e) for (t, s, e) in splitter(text)]
            got = word_tokenize(text)
            assert got == exp, text

    def test_random_ascii_fuzz(self, ref):
        splitter = ref.tokenizer.WhitespaceTokenSplitter()
        rng = random.Random(99)
        alphabet = "ab c-_.!?12\t"
        for _ in range(300):
            text = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
            assert word_tokenize(text) == [(t, s, e) for (t, s, e) in splitter(text)], repr(text)
