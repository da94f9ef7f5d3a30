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


class _NT:
    """Minimal numpy-backed torch.Tensor stand-in: exactly the surface
    _decode_batch_item touches (indexing, item, tolist, unsqueeze, *,
    >, shape, device)."""

    def __init__(self, a):
        import numpy as np

        self.a = np.asarray(a)

    @property
    def shape(self):
        return self.a.shape

    @property
    def device(self):
        return "cpu"

    def __getitem__(self, idx):
        return _NT(self.a[_NT._u(idx)])

    def __setitem__(self, idx, value):
        self.a[idx] = value.a if isinstance(value, _NT) else value

    def item(self):
        return self.a.item()

    def tolist(self):
        return self.a.tolist()

    def unsqueeze(self, dim):
        import numpy as np

        return _NT(np.expand_dims(self.a, dim))

    def __mul__(self, other):
        return _NT(self.a * (other.a if isinstance(other, _NT) else other))

    __rmul__ = __mul__

    def __gt__(self, other):
        return _NT(self.a > (other.a if isinstance(other, _NT) else other))

    def size(self, dim):
        return self.a.shape[dim]

    def permute(self, *dims):
        import numpy as np

        return _NT(np.transpose(self.a, dims))

    def __lt__(self, other):
        return _NT(self.a < (other.a if isinstance(other, _NT) else other))

    def any(self):
        return bool(self.a.any())

    def min(self):
        return _NT(self.a.min())

    def __bool__(self):
        return bool(self.a)

    def __iter__(self):
        return (_NT(x) for x in self.a)

    # -- surface for extract_spans_from_tokens (modeling/utils.py:299) --
    @staticmethod
    def _u(x):
        """Unwrap _NT (incl. inside index tuples) to numpy."""
        if isinstance(x, _NT):
            return x.a
        if isinstance(x, tuple):
            return tuple(_NT._u(e) for e in x)
        return x

    def __eq__(self, other):
        return _NT(self.a == self._u(other))

    __hash__ = object.__hash__  # __eq__ would otherwise unset it

    def __le__(self, other):
        return _NT(self.a <= self._u(other))

    def __ge__(self, other):
        return _NT(self.a >= self._u(other))

    def __and__(self, other):
        return _NT(self.a & self._u(other))

    def __add__(self, other):
        return _NT(self.a + self._u(other))

    __radd__ = __add__

    def __sub__(self, other):
        return _NT(self.a - self._u(other))

    def long(self):
        import numpy as np

        return _NT(self.a.astype(np.int64))

    # -- surface for _build_span_label_map_for_batch (decoder.py:446) --
    def __ne__(self, other):
        return _NT(self.a != self._u(other))

    def sum(self, dim=None):
        return _NT(self.a.sum(axis=dim))

    def cumsum(self, dim):
        return _NT(self.a.cumsum(axis=dim))

    @property
    def T(self):
        return _NT(self.a.T)

    def nonzero(self, as_tuple=False):
        import numpy as np

        if as_tuple:
            return tuple(_NT(i) for i in np.nonzero(self.a))
        return _NT(np.argwhere(self.a))


def _rich_torch_shim():
    """numpy-backed torch module good enough to EXECUTE the reference's
    span decode (not just import it)."""
    import numpy as np

    class _ShimModule(types.ModuleType):
        # annotations elsewhere in the file touch torch.LongTensor etc.
        def __getattr__(self, name):
            return type(name, (), {})

    m = _ShimModule("torch")
    m.Tensor = _NT
    m.bool = np.bool_

    def where(cond):
        return tuple(_NT(i) for i in np.where(cond.a))

    def zeros(*shape, dtype=None, device=None):
        return _NT(np.zeros(shape, dtype=bool if dtype is m.bool else dtype))

    def topk(t, k, sorted=True):
        idx = np.argsort(-t.a, kind="stable")[:k]
        return _NT(t.a[idx]), _NT(idx)

    def ones(shape, dtype=None, device=None):
        return _NT(np.ones(shape, dtype=bool if dtype is m.bool else dtype))

    def sigmoid(t):
        return _NT(1.0 / (1.0 + np.exp(-t.a)))

    def cat(tensors, dim=0):
        return _NT(np.concatenate([t.a for t in tensors], axis=dim))

    m.where, m.zeros, m.topk = where, zeros, topk
    m.ones, m.sigmoid, m.cat = ones, sigmoid, cat

    # -- surface for extract_spans_from_tokens (modeling/utils.py:299) --
    m.long = np.int64

    def empty(*shape, dtype=None, device=None):
        return _NT(np.empty(shape, dtype=np.int64 if dtype is m.long else dtype))

    def stack(tensors, dim=0):
        return _NT(np.stack([t.a for t in tensors], axis=dim))

    def full(shape, fill, dtype=None, device=None):
        return _NT(np.full(shape, fill, dtype=np.int64 if dtype is m.long else dtype))

    def _pad(t, pads, mode="constant", value=0):
        a = t.a
        npad = [(0, 0)] * a.ndim
        for i in range(len(pads) // 2):  # torch pads last dims first
            npad[a.ndim - 1 - i] = (pads[2 * i], pads[2 * i + 1])
        return _NT(np.pad(a, npad, constant_values=value))

    m.empty, m.stack, m.full = empty, stack, full
    nn = types.ModuleType("torch.nn")
    nn.functional = types.SimpleNamespace(pad=_pad)
    m.nn = nn
    return m


@pytest.fixture(scope="module")
def ref_decoder_live(ref):
    """The reference SpanDecoder with an EXECUTABLE numpy torch shim —
    its decode actually runs, tensor ops and all."""
    created = []
    old_torch = sys.modules.get("torch")
    sys.modules["torch"] = _rich_torch_shim()
    try:
        for name in ("refg2", "refg2.decoding"):
            m = types.ModuleType(name)
            m.__path__ = []
            sys.modules[name] = m
            created.append(name)
        _load("refg2.decoding.utils", f"{REF}/decoding/utils.py", "refg2.decoding")
        created.append("refg2.decoding.utils")
        dec = _load(
            "refg2.decoding.decoder", f"{REF}/decoding/decoder.py", "refg2.decoding"
        )
        created.append("refg2.decoding.decoder")
    except Exception as e:
        for n in created:
            sys.modules.pop(n, None)
        if old_torch is not None:
            sys.modules["torch"] = old_torch
        pytest.skip(f"reference decoder not executable under shim: {e!r}")
    yield dec
    for n in created:
        sys.modules.pop(n, None)
    if old_torch is not None:
        sys.modules["torch"] = old_torch
    else:
        sys.modules.pop("torch", None)


class TestFullSpanDecodeParity:
    """D1-D4 + D9 differential: the reference's _decode_batch_item runs
    LIVE (numpy shim) against our decode_span_probs on random tensors."""

    def _run_ref(self, dec_mod, probs, tokens, id_to_class, **kw):
        decoder = dec_mod.SpanDecoder(config=None)
        return decoder._decode_batch_item(
            _NT(probs),
            tokens,
            id_to_class,
            probs.shape[1],
            kw.get("threshold", 0.5),
            kw.get("flat_ner", True),
            kw.get("multi_label", False),
            {},
            return_class_probs=kw.get("return_class_probs", False),
            input_spans_i=kw.get("input_spans"),
        )

    def test_random_tensors_all_modes(self, ref_decoder_live):
        import numpy as np

        rng = np.random.default_rng(7)
        id_to_class = {1: "A", 2: "B", 3: "C"}
        for case in range(60):
            L = int(rng.integers(1, 10))
            K = int(rng.integers(1, 5))
            probs = rng.random((L, K, 3))
            tokens = [f"t{i}" for i in range(L)]
            flat = bool(case % 2)
            ml = bool((case // 2) % 2)
            exp = self._run_ref(
                ref_decoder_live, probs, tokens, id_to_class,
                flat_ner=flat, multi_label=ml,
            )
            got = ours.decode_span_probs(
                probs, tokens, id_to_class,
                threshold=0.5, flat_ner=flat, multi_label=ml,
            )
            assert [
                (s.start, s.end, s.entity_type, s.score) for s in got
            ] == [
                (s.start, s.end, s.entity_type, s.score) for s in exp
            ], (case, flat, ml)

    def test_class_probs_and_input_spans(self, ref_decoder_live):
        import numpy as np

        rng = np.random.default_rng(11)
        id_to_class = {1: "A", 2: "B", 3: "C"}
        probs = rng.random((8, 3, 3))
        tokens = [f"t{i}" for i in range(8)]
        spans = [(0, 1), (2, 2), (5, 7), (7, 9)]  # last is invalid width
        exp = self._run_ref(
            ref_decoder_live, probs, tokens, id_to_class,
            return_class_probs=True, input_spans=spans,
        )
        got = ours.decode_span_probs(
            probs, tokens, id_to_class, threshold=0.5,
            return_class_probs=True, input_spans=spans,
        )
        assert [
            (s.start, s.end, s.entity_type, s.score, s.class_probs) for s in got
        ] == [
            (s.start, s.end, s.entity_type, s.score, s.class_probs) for s in exp
        ]


class TestRelationDecodeParity:
    """D7 differential: the reference's _decode_relations runs LIVE
    (numpy shim) against our decode_relations — including the post-
    greedy index-alignment quirk (decoder.py:822)."""

    def test_random_relation_batches(self, ref_decoder_live):
        import numpy as np

        dec = ref_decoder_live.SpanRelexDecoder(config=None)
        rng = np.random.default_rng(23)
        rel_id_to_class = {1: "works_at", 2: "located_in"}
        for case in range(40):
            n_spans = int(rng.integers(0, 5))
            spans_ref = [
                (i, i + 1, "T", 0.9) for i in range(n_spans)
            ]  # contents unused by the decode; only len() matters
            spans_ours = [ours.Span(i, i + 1, "T", 0.9) for i in range(n_spans)]
            N = int(rng.integers(1, 7))
            # indices intentionally include out-of-range values to hit
            # the pruned-endpoint semi-join path
            rel_idx = rng.integers(-1, n_spans + 2, size=(N, 2))
            rel_logits = rng.normal(0, 2, size=(N, 2))
            mask = rng.random(N) > 0.2
            exp = dec._decode_relations(
                None,
                [spans_ref],
                _NT(rel_idx[None]),
                _NT(rel_logits[None]),
                _NT(mask[None]),
                rel_id_to_class,
                threshold=0.5,
                batch_size=1,
            )[0]
            got = ours.decode_relations(
                spans_ours,
                rel_idx,
                1.0 / (1.0 + np.exp(-rel_logits)),
                mask,
                rel_id_to_class,
                threshold=0.5,
            )
            assert got == exp, case


class TestTokenDecodeParity:
    """D5 differential: the reference TokenDecoder's token-level decode
    (start/end/inside + min-score rule) runs LIVE against ours."""

    def test_random_token_batches(self, ref_decoder_live):
        import numpy as np

        from gliner_spark.kernel.decoding import sigmoid as np_sigmoid

        dec = ref_decoder_live.TokenDecoder(config=None)
        rng = np.random.default_rng(31)
        id_to_class = {1: "A", 2: "B"}
        for case in range(40):
            W = int(rng.integers(1, 12))
            logits = rng.normal(0, 1.2, size=(1, W, 2, 3))
            tokens = [[f"t{i}" for i in range(W)]]
            flat = bool(case % 2)
            ml = bool((case // 2) % 2)
            exp = dec.decode(
                tokens, id_to_class, _NT(logits),
                flat_ner=flat, threshold=0.5, multi_label=ml,
            )[0]
            probs = np_sigmoid(logits[0])  # (W, C, 3)
            got = ours.decode_token_scores(
                probs[:, :, 0], probs[:, :, 1], probs[:, :, 2],
                id_to_class, threshold=0.5, flat_ner=flat, multi_label=ml,
            )
            assert [
                (s.start, s.end, s.entity_type, s.score) for s in got
            ] == [
                (s.start, s.end, s.entity_type, s.score) for s in exp
            ], (case, flat, ml)


class TestTokenRelexParity:
    """Token-mode joint relex differentials: the candidate-span
    proposal (extract_spans_from_tokens, modeling/utils.py:299-379) and
    the full TokenRelexDecoder.decode (decoding/decoder.py:1325-1427,
    incl. _decode_relations' index-alignment quirk) run LIVE under the
    shim against our kernel composition."""

    @pytest.fixture(scope="class")
    def ref_modeling_utils(self, ref_decoder_live):
        old_torch = sys.modules.get("torch")
        sys.modules["torch"] = _rich_torch_shim()
        try:
            mod = _load(
                "refg2.modeling.utils",
                f"{REF}/modeling/utils.py",
                "refg2.modeling",
            )
        except Exception as e:
            pytest.skip(f"reference modeling.utils not loadable: {e!r}")
        finally:
            if old_torch is not None:
                sys.modules["torch"] = old_torch
        yield mod
        sys.modules.pop("refg2.modeling.utils", None)

    def test_candidate_proposal_random(self, ref_modeling_utils):
        import numpy as np

        from gliner_spark.kernel.decoding import (
            extract_spans_from_token_probs,
            sigmoid as np_sigmoid,
        )

        rng = np.random.default_rng(47)
        for case in range(120):
            W = int(rng.integers(1, 14))
            C = int(rng.integers(1, 4))
            logits = rng.normal(0, 1.5, size=(1, W, C, 3))
            span_idx, span_mask = ref_modeling_utils.extract_spans_from_tokens(
                _NT(logits), None, 0.5
            )
            exp = span_idx.a[0][span_mask.a[0].astype(bool)]
            probs = np_sigmoid(logits[0])
            got = extract_spans_from_token_probs(
                probs[:, :, 0], probs[:, :, 1], probs[:, :, 2], 0.5
            )
            assert got.tolist() == exp.tolist(), case

    def test_token_relex_decode_random(self, ref_decoder_live):
        import numpy as np

        from gliner_spark.kernel.decoding import sigmoid as np_sigmoid

        dec = ref_decoder_live.TokenRelexDecoder(config=None)
        rng = np.random.default_rng(53)
        id_to_class = {1: "A", 2: "B"}
        rel_id_to_class = {1: "works_at", 2: "located_in"}
        for case in range(40):
            W = int(rng.integers(1, 12))
            logits = rng.normal(0, 1.2, size=(1, W, 2, 3))
            tokens = [[f"t{i}" for i in range(W)]]
            N = int(rng.integers(1, 7))
            # indices intentionally include out-of-range values to hit
            # the post-greedy index-alignment quirk (decoder.py:1305)
            rel_idx = rng.integers(-1, 8, size=(N, 2))
            rel_logits = rng.normal(0, 2, size=(N, 2))
            mask = rng.random(N) > 0.2
            flat = bool(case % 2)
            exp_spans, exp_rels = dec.decode(
                tokens, id_to_class, _NT(logits),
                rel_idx=_NT(rel_idx[None]),
                rel_logits=_NT(rel_logits[None]),
                rel_mask=_NT(mask[None]),
                flat_ner=flat, threshold=0.5, relation_threshold=0.5,
                multi_label=False, rel_id_to_classes=rel_id_to_class,
            )
            probs = np_sigmoid(logits[0])  # (W, C, 3)
            got_spans = ours.decode_token_scores(
                probs[:, :, 0], probs[:, :, 1], probs[:, :, 2],
                id_to_class, threshold=0.5, flat_ner=flat, multi_label=False,
            )
            got_rels = ours.decode_relations(
                got_spans, rel_idx, np_sigmoid(rel_logits), mask,
                rel_id_to_class, threshold=0.5,
            )
            assert [
                (s.start, s.end, s.entity_type, s.score) for s in got_spans
            ] == [
                (s.start, s.end, s.entity_type, s.score) for s in exp_spans[0]
            ], case
            assert got_rels == exp_rels[0], case


class TestDataProcessingParity:
    """T5 span enumeration + class-id mappings differential against
    data_processing/utils.py (loaded under the executable shim)."""

    @pytest.fixture(scope="class")
    def ref_utils(self, ref_decoder_live):
        old_torch = sys.modules.get("torch")
        sys.modules["torch"] = _rich_torch_shim()
        try:
            mod = _load(
                "refg2.data_processing.utils",
                f"{REF}/data_processing/utils.py",
                "refg2.data_processing",
            )
        except Exception as e:
            pytest.skip(f"reference dp.utils not loadable: {e!r}")
        finally:
            if old_torch is not None:
                sys.modules["torch"] = old_torch
        yield mod
        sys.modules.pop("refg2.data_processing.utils", None)

    def test_prepare_span_idx(self, ref_utils):
        from gliner_spark.kernel.spans import span_idx_array

        for L in (0, 1, 3, 7, 25):
            for K in (1, 2, 12):
                exp = ref_utils.prepare_span_idx(L, K)
                got = [tuple(r) for r in span_idx_array(L, K)]
                assert got == exp, (L, K)

    def test_prepare_word_mask(self, ref_utils):
        """T4 differential: mock tokenization object with word_ids()
        drives the reference's prepare_word_mask against our port across
        specials/continuations/skip/token-level combinations."""
        import random as _random

        from gliner_spark.kernel.wordmask import word_masks

        class MockTok:
            def __init__(self, per_seq):
                self.per_seq = per_seq

            def word_ids(self, i):
                return self.per_seq[i]

        rng = _random.Random(5)
        cases = []
        for _ in range(50):
            seqs = []
            for _s in range(rng.randint(1, 3)):
                wids, w = [None], 0
                for _t in range(rng.randint(0, 12)):
                    r = rng.random()
                    if r < 0.15:
                        wids.append(None)
                    elif r < 0.55:
                        wids.append(w)  # continuation
                    else:
                        w += 1
                        wids.append(w)
                wids.append(None)
                seqs.append(wids)
            skips = [rng.randint(0, 3) for _ in seqs]
            cases.append((seqs, skips))
        for seqs, skips in cases:
            for token_level in (False, True):
                exp = ref_utils.prepare_word_mask(
                    [["x"]] * len(seqs),
                    MockTok(seqs),
                    skip_first_words=skips,
                    token_level=token_level,
                )
                got = word_masks(seqs, skips, token_level)
                assert got == exp, (seqs, skips, token_level)

    def test_make_mapping(self, ref_utils):
        from gliner_spark.kernel.spans import make_mapping

        for labels in (
            ["PERSON", "ORG", "LOC", "PERSON"],
            [],
            ["a"],
            ["x", "x", "x"],
        ):
            assert make_mapping(labels) == ref_utils.make_mapping(labels)


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


@pytest.fixture(scope="module")
def ref_processor(ref):
    """Load the reference's processor module (T1/T2 prompt construction)
    under extended torch submodule fakes."""
    created = []

    def fake_mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        created.append(name)
        return m

    # `from torch.utils.data import DataLoader` / `from torch.nn.utils.rnn
    # import pad_sequence` need real module entries, not attribute stubs
    fake_mod("torch.utils")
    fake_mod("torch.utils.data", DataLoader=type("DataLoader", (), {}))
    fake_mod("torch.nn")
    fake_mod("torch.nn.utils")
    fake_mod("torch.nn.utils.rnn", pad_sequence=lambda *a, **k: None)
    try:
        _load(
            "refg.data_processing.utils",
            f"{REF}/data_processing/utils.py",
            "refg.data_processing",
        )
        processor = _load(
            "refg.data_processing.processor",
            f"{REF}/data_processing/processor.py",
            "refg.data_processing",
        )
    except Exception as e:
        for n in created:
            sys.modules.pop(n, None)
        pytest.skip(f"reference processor not loadable: {e!r}")
    yield processor
    for n in created:
        sys.modules.pop(n, None)


class TestPromptConstructionParity:
    """Run the reference's OWN prepare_inputs (processor.py:152-197
    entity; :1813-1862 relex) against kernel/prompts on random cases."""

    def _stub(self, mod):
        stub = types.SimpleNamespace(
            ent_token="<<ENT>>", sep_token="<<SEP>>", rel_token="<<REL>>"
        )
        base = mod.BaseProcessor
        stub._select_entities = base._select_entities.__get__(stub)
        stub._maybe_remap_entities = base._maybe_remap_entities.__get__(stub)
        stub._extra_prompt_tokens = base._extra_prompt_tokens.__get__(stub)
        return stub

    def test_entity_prompt_parity(self, ref_processor):
        from gliner_spark.kernel.prompts import build_entity_prompt

        stub = self._stub(ref_processor)
        rng = random.Random(77)
        vocab = ["alpha", "beta", "gamma", "x-ray", "naïve", "42", "..."]
        for _ in range(60):
            labels = [
                rng.choice(["person", "org", "multi word label", "ößü"])
                for _ in range(rng.randrange(1, 6))
            ]
            labels = list(dict.fromkeys(labels))
            tokens = [rng.choice(vocab) for _ in range(rng.randrange(0, 12))]
            exp_texts, exp_lens = ref_processor.BaseProcessor.prepare_inputs(
                stub, [tokens], labels
            )
            got_tokens, got_len = build_entity_prompt(tokens, labels)
            assert got_tokens == exp_texts[0]
            assert got_len == exp_lens[0]

    def test_relex_prompt_parity(self, ref_processor):
        from gliner_spark.kernel.prompts import build_relex_prompt

        stub = self._stub(ref_processor)
        rng = random.Random(78)
        for _ in range(60):
            labels = list(
                dict.fromkeys(
                    rng.choice(["person", "org", "loc"]) for _ in range(rng.randrange(1, 5))
                )
            )
            rels = list(
                dict.fromkeys(
                    rng.choice(["works_at", "born in", "x"]) for _ in range(rng.randrange(0, 4))
                )
            )
            tokens = ["tok%d" % i for i in range(rng.randrange(0, 9))]
            exp_texts, exp_lens = (
                ref_processor.RelationExtractionSpanProcessor.prepare_inputs(
                    stub, [tokens], labels, relations=rels
                )
            )
            got_tokens, got_len = build_relex_prompt(tokens, labels, rels)
            assert got_tokens == exp_texts[0]
            assert got_len == exp_lens[0]


class TestSpanEnumerationParity:
    """T5: the reference's own prepare_span_idx (utils.py:215-252)
    against kernel/spans.span_idx_array, exhaustively for small grids."""

    def test_exhaustive_grid(self, ref_processor):
        import numpy as np

        from gliner_spark.kernel.spans import span_idx_array

        ref_utils = sys.modules["refg.data_processing.utils"]
        for num_tokens in range(0, 15):
            for max_width in range(1, 14):
                exp = ref_utils.prepare_span_idx(num_tokens, max_width)
                got = span_idx_array(num_tokens, max_width)
                assert got.shape == (len(exp), 2)
                assert [tuple(r) for r in np.asarray(got)] == exp, (
                    num_tokens,
                    max_width,
                )


class TestTokenSplitterParity:
    """Execute the reference's OWN per-language splitter classes and
    MultiLangWordsSplitter (tokenizer.py:102-404) against our dispatch
    over the SAME fake segmenter packages — token streams and char
    offsets must match exactly."""

    @pytest.fixture()
    def lang_fakes(self, monkeypatch, ref):
        import gliner_spark.kernel.tokenization as tk

        def tree(dotted, leaf):
            parts = dotted.split(".")
            for i in range(1, len(parts) + 1):
                name = ".".join(parts[:i])
                mod = sys.modules.get(name)
                if not isinstance(mod, types.ModuleType) or i == len(parts):
                    mod = types.ModuleType(name)
                    monkeypatch.setitem(sys.modules, name, mod)
                if i == len(parts):
                    for k, v in leaf.items():
                        setattr(mod, k, v)
                if i > 1:
                    setattr(sys.modules[".".join(parts[: i - 1])], parts[i - 1], mod)

        class _Jieba3:
            def cut_text(self, text):
                return [s for s in text.split("|") if s]

        tree("jieba3", {"jieba3": _Jieba3})

        class _MeCab:
            def morphs(self, text):
                return [s for s in text.split("|") if s]

        tree("mecab", {"MeCab": _MeCab})

        class _Janome:
            def __init__(self, *a, **k):
                pass

            def tokenize(self, text, wakati=True):
                return [s for s in text.split("|") if s]

        tree("janome.tokenizer", {"Tokenizer": _Janome})
        tree(
            "camel_tools.tokenizers.word",
            {"simple_word_tokenize": lambda text: [s for s in text.split("|") if s]},
        )

        class _IT:
            @staticmethod
            def trivial_tokenize(text, lang="hi"):
                return [s for s in text.split("|") if s]

        tree("indicnlp.tokenize", {"indic_tokenize": _IT})

        class _Factory:
            seed = None

        def detect(text):
            if any(0x4E00 <= ord(c) <= 0x9FFF for c in text):
                return "zh"
            return "en"

        tree("langdetect", {"DetectorFactory": _Factory, "detect": detect})

        class _LDE(Exception):
            pass

        tree("langdetect.lang_detect_exception", {"LangDetectException": _LDE})

        monkeypatch.setattr(ref.tokenizer, "is_module_available", lambda _n: True)
        monkeypatch.setattr(tk, "_BACKEND_CACHE", {})
        yield tk

    CASES = [
        ("zh", "JiebaTokenSplitter", "云计算|平台|运行良好"),
        ("ko", "MecabKoTokenSplitter", "안녕|하세요|세계"),
        ("ja", "JanomeJaTokenSplitter", "これ|は|テスト"),
        ("ar", "CamelArabicSplitter", "كلمة|أخرى|هنا"),
        ("hi", "HindiSplitter", "नमस्ते|दुनिया|आज"),
    ]

    def test_per_language_splitters_match(self, ref, lang_fakes):
        tk = lang_fakes
        for lang, cls_name, text in self.CASES:
            ref_out = list(getattr(ref.tokenizer, cls_name)()(text))
            ours = list(tk.splitter_for_lang(lang)(text))
            assert ours == ref_out, (lang, ours, ref_out)

    def test_multilang_dispatch_matches_universal(self, ref, lang_fakes):
        tk = lang_fakes
        ml = ref.tokenizer.MultiLangWordsSplitter(use_spacy=False)
        for text in ("云计算|平台|运行良好", "plain english words here"):
            ref_out = list(ml(text))
            ours = list(tk._universal_splitter(text))
            assert ours == ref_out, (text, ours, ref_out)

    def test_whitespace_splitter_regex_identical(self, ref):
        import gliner_spark.kernel.tokenization as tk

        ws = ref.tokenizer.WhitespaceTokenSplitter()
        for text in (
            "hyphen-word under_score u.s. 3.14 (parens)!",
            "tabs\tand  double  spaces",
        ):
            assert list(ws(text)) == list(tk._regex_splitter(text))


class TestGenerativeBookkeepingParity:
    """M15/D10 bookkeeping differential: the reference's
    SpanGenerativeDecoder._build_span_label_map_for_batch and
    _update_id_to_classes_with_generated (decoding/decoder.py:415-490)
    EXECUTED under the numpy shim vs our single-document kernels
    (gliner_spark/model/generative.py)."""

    def test_span_label_map_batch_differential(self, ref_decoder_live):
        import random

        from gliner_spark.model.generative import build_span_label_map

        cls = ref_decoder_live.SpanGenerativeDecoder
        rng = random.Random(20260817)
        for _ in range(40):
            B = rng.randrange(1, 4)
            M = rng.randrange(1, 6)
            n_seq = rng.randrange(1, 4)
            sel = []
            for _b in range(B):
                n_valid = rng.randrange(0, M + 1)
                row = sorted(rng.sample(range(50), n_valid)) + [-1] * (M - n_valid)
                sel.append(row)
            total = sum(1 for row in sel for v in row if v != -1)
            gen_labels = [f"lab{i}" for i in range(total * n_seq)]
            ref_maps = cls._build_span_label_map_for_batch(
                None, _NT(sel), gen_labels, n_seq
            )
            # ours is per-document: replicate the reference's cursor walk
            cursor = 0
            for b in range(B):
                valid = [v for v in sel[b] if v != -1]
                ours = build_span_label_map(
                    valid,
                    gen_labels[cursor * n_seq : (cursor + len(valid)) * n_seq],
                    n_seq,
                )
                assert ours == ref_maps[b], (sel, b)
                cursor += len(valid)

    def test_update_id_to_classes_differential(self, ref_decoder_live):
        from gliner_spark.model.generative import updated_id_to_classes

        cls = ref_decoder_live.SpanGenerativeDecoder
        id_to_classes = [
            {1: "person", 2: "org", 3: "loc"},
            {1: "person", 2: "org", 3: "loc"},
        ]
        gen = [f"g{i}" for i in range(6)]
        ref_out = cls._update_id_to_classes_with_generated(None, id_to_classes, gen, 2)
        cursor = 0
        for b in range(2):
            k = len(id_to_classes[b])
            ours = updated_id_to_classes(id_to_classes[b], gen[cursor : cursor + k])
            assert ours == ref_out[b]
            cursor += k


class TestTokenGenerativeDecodeParity:
    """Token-generative decode bookkeeping differential
    (TokenGenerativeDecoder.decode_generative, decoder.py:1438-1533)
    against our decode_candidate_span_probs + build_span_label_map
    composition.

    Upstream defect, pinned here: decode_generative appends RAW
    5-tuples (decoder.py:1529) but BaseDecoder.greedy_search reads
    ``.score``/``.start`` attributes (decoder.py:99-115), so the
    reference path crashes as written. The differential therefore runs
    the reference through a minimal adapter subclass whose
    greedy_search converts each tuple to the reference's own Span
    dataclass, calls the REFERENCE BaseDecoder.greedy_search, and
    converts back — every decision (selection order, overlap
    predicates, gen-label keying by candidate position, id_to_classes
    substitution in prompt mode) is still the reference's code."""

    def _mk_dec(self, dec_mod, decoder_mode):
        cfg = types.SimpleNamespace(decoder_mode=decoder_mode, labels_decoder="x")

        class _Adapted(dec_mod.TokenGenerativeDecoder):
            def greedy_search(self, spans, flat_ner=True, multi_label=False):
                as_spans = [
                    dec_mod.Span(
                        start=t[0], end=t[1], entity_type=t[2],
                        score=t[4], generated_labels=t[3],
                    )
                    for t in spans
                ]
                return dec_mod.BaseDecoder.greedy_search(
                    self, as_spans, flat_ner, multi_label
                )

        return _Adapted(cfg)

    def test_reference_crashes_on_raw_tuples(self, ref_decoder_live):
        """The unadapted reference decode_generative is not executable:
        tuples reach Span-expecting greedy_search (upstream defect our
        kernel does not reproduce)."""
        import numpy as np

        cfg = types.SimpleNamespace(decoder_mode="span", labels_decoder="x")
        dec = ref_decoder_live.TokenGenerativeDecoder(cfg)
        S, C, W = 3, 2, 5
        span_idx = np.stack([np.arange(S), np.arange(S)], axis=1)[None]
        with pytest.raises(AttributeError, match="score"):
            dec.decode_generative(
                tokens=[["t"] * W], id_to_classes={1: "A", 2: "B"},
                model_output=_NT(np.zeros((1, W, C, 3))),
                gen_labels=["g"] * S,
                sel_idx=_NT(np.array([[0, 1, 2]])),
                num_gen_sequences=1, flat_ner=True, threshold=0.0,
                multi_label=False,
                span_logits=_NT(np.full((1, S, C), 5.0)),
                span_idx=_NT(span_idx),
                span_mask=_NT(np.ones((1, S), dtype=bool)),
            )

    def test_span_mode_random(self, ref_decoder_live):
        import numpy as np

        from gliner_spark.kernel.decoding import (
            decode_candidate_span_probs,
            sigmoid,
        )
        from gliner_spark.model.generative import build_span_label_map

        rng = np.random.default_rng(20260818)
        id_to_class = {1: "A", 2: "B", 3: "C"}
        C = 3
        for case in range(60):
            S = int(rng.integers(1, 9))
            W = int(rng.integers(3, 10))
            n_seq = int(rng.integers(1, 3))
            flat = bool(case % 2)
            ml = bool((case // 2) % 2)
            thr = float(rng.choice([0.3, 0.5, 0.6]))
            span_logits = rng.normal(size=(1, S, C)) * 2
            starts = rng.integers(0, W, size=S)
            widths = rng.integers(0, 3, size=S)
            span_idx = np.stack([starts, starts + widths], axis=1)[None]
            # half the cases: full mask (the production invariant —
            # our candidate list is packed); half: random partial mask
            if case % 2 == 0:
                mask = np.ones(S, dtype=bool)
            else:
                mask = rng.random(S) > 0.3
            valid = np.nonzero(mask)[0]
            # decoder-kept subset of the valid candidates, reference
            # keep rule: sigmoid(span_logits).max(-1) > 0.5
            sp_full = sigmoid(span_logits[0])
            kept_full = [
                int(i) for i in valid if sp_full[i].max() > 0.5
            ]
            sel_row = kept_full + [-1] * (S - len(kept_full))
            gen_labels = [
                f"lab{i}" for i in range(len(kept_full) * n_seq)
            ]
            ref_out = self._mk_dec(ref_decoder_live, "span").decode_generative(
                tokens=[["t"] * W], id_to_classes=id_to_class,
                model_output=_NT(np.zeros((1, W, C, 3))),
                gen_labels=gen_labels,
                sel_idx=_NT(np.array([sel_row])),
                num_gen_sequences=n_seq, flat_ner=flat, threshold=thr,
                multi_label=ml,
                span_logits=_NT(span_logits), span_idx=_NT(span_idx),
                span_mask=_NT(mask[None]),
            )[0]
            # ours: packed candidates = the valid rows, label-map keys
            # remapped full-position → packed-position (identity when
            # the mask is full — the production case)
            packed_of = {int(f): p for p, f in enumerate(valid)}
            our_map = build_span_label_map(
                [packed_of[f] for f in kept_full], gen_labels, n_seq
            )
            got = decode_candidate_span_probs(
                sp_full[valid], span_idx[0][valid], id_to_class,
                span_label_map=our_map, threshold=thr,
                flat_ner=flat, multi_label=ml,
            )
            assert [
                (s.start, s.end, s.entity_type, s.score, tuple(s.generated_labels or []))
                for s in got
            ] == [
                (s.start, s.end, s.entity_type, s.score, tuple(s.generated_labels or []))
                for s in ref_out
            ], (case, flat, ml, thr)

    def test_prompt_mode_random(self, ref_decoder_live):
        import numpy as np

        from gliner_spark.kernel.decoding import (
            decode_candidate_span_probs,
            sigmoid,
        )
        from gliner_spark.model.generative import updated_id_to_classes

        rng = np.random.default_rng(7)
        id_to_class = {1: "A", 2: "B", 3: "C"}
        C = 3
        for case in range(20):
            S = int(rng.integers(1, 7))
            W = 8
            span_logits = rng.normal(size=(1, S, C)) * 2
            starts = rng.integers(0, W, size=S)
            span_idx = np.stack([starts, starts + rng.integers(0, 3, size=S)], axis=1)[None]
            gen = [f"gen{i}" for i in range(C)]
            ref_out = self._mk_dec(ref_decoder_live, "prompt").decode_generative(
                tokens=[["t"] * W], id_to_classes=id_to_class,
                model_output=_NT(np.zeros((1, W, C, 3))),
                gen_labels=gen, sel_idx=None, num_gen_sequences=1,
                flat_ner=True, threshold=0.4, multi_label=False,
                span_logits=_NT(span_logits), span_idx=_NT(span_idx),
                span_mask=_NT(np.ones((1, S), dtype=bool)),
            )[0]
            got = decode_candidate_span_probs(
                sigmoid(span_logits[0]), span_idx[0],
                updated_id_to_classes(id_to_class, gen),
                threshold=0.4,
            )
            assert [
                (s.start, s.end, s.entity_type, s.score) for s in got
            ] == [
                (s.start, s.end, s.entity_type, s.score) for s in ref_out
            ], case
