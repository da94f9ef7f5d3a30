"""Property-based kernel invariants (hypothesis).

These pin the *laws* the kernels must satisfy for any input, not just
the fixtures: tokenizer offset integrity, greedy-decode non-overlap,
threshold discipline, and the byte-identical-slice invariant the whole
pipeline guarantees per url.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from gliner_spark.kernel.decoding import (
    Span,
    decode_span_probs,
    greedy_search,
    has_overlapping,
)
from gliner_spark.kernel.tokenization import word_tokenize
from gliner_spark.model.pipeline import GLiNERPipeline, PipelineConfig

texts = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs", "Pd"),
        max_codepoint=0x2FFF,
    ),
    max_size=120,
)

span_lists = st.lists(
    st.builds(
        Span,
        start=st.integers(0, 25),
        end=st.integers(0, 30),
        entity_type=st.sampled_from(["A", "B", "C"]),
        score=st.sampled_from([0.31, 0.5, 0.5, 0.77, 0.9]),
    ).filter(lambda s: s.end >= s.start),
    max_size=14,
)


class TestTokenizerProperties:
    @given(texts)
    @settings(max_examples=200)
    def test_offsets_slice_back_to_tokens(self, text):
        toks = word_tokenize(text)
        prev_end = -1
        for tok, s, e in toks:
            assert text[s:e] == tok          # byte-identity at token level
            assert s >= prev_end             # non-overlapping, ordered
            assert e > s
            prev_end = e

    @given(texts)
    @settings(max_examples=100)
    def test_no_whitespace_inside_tokens(self, text):
        for tok, _s, _e in word_tokenize(text):
            assert not any(c.isspace() for c in tok)


class TestGreedyProperties:
    @given(span_lists, st.booleans())
    @settings(max_examples=200)
    def test_flat_output_never_overlaps(self, spans, multi_label):
        kept = greedy_search(spans, flat_ner=True, multi_label=multi_label)
        for i, a in enumerate(kept):
            for b in kept[i + 1:]:
                assert not has_overlapping(
                    (a.start, a.end, a.entity_type),
                    (b.start, b.end, b.entity_type),
                    multi_label=multi_label,
                )

    @given(span_lists)
    @settings(max_examples=100)
    def test_output_subset_sorted_and_max_first(self, spans):
        kept = greedy_search(spans, flat_ner=True)
        ids = {id(s) for s in spans}
        assert all(id(s) in ids for s in kept)  # no invented spans
        assert [s.start for s in kept] == sorted(s.start for s in kept)
        if spans:
            # the single highest-scoring span always survives (stable
            # first pick of the greedy order)
            best = sorted(spans, key=lambda x: -x.score)[0]
            assert any(k is best for k in kept)


class TestDecodeProperties:
    @given(
        st.integers(1, 8),   # L
        st.integers(1, 4),   # K
        st.integers(1, 3),   # C
        st.integers(0, 10_000),
    )
    @settings(max_examples=100)
    def test_threshold_discipline_and_validity(self, L, K, C, seed):
        rng = np.random.default_rng(seed)
        probs = rng.random((L, K, C))
        id_to_class = {i + 1: f"c{i}" for i in range(C)}
        tokens = [f"t{i}" for i in range(L)]
        out = decode_span_probs(probs, tokens, id_to_class, threshold=0.6)
        for s in out:
            assert s.score > 0.6
            assert 0 <= s.start <= s.end < L  # validity rule D2


class TestPipelineByteIdentity:
    @given(texts)
    @settings(max_examples=50, deadline=None)
    def test_entities_slice_exactly(self, text):
        pipe = GLiNERPipeline(
            ["thing", "stuff"],
            [],
            PipelineConfig(threshold=0.3),
            gazetteer={"alpha beta": "thing"},
        )
        for e in pipe.predict_entities(text):
            assert text[e["start"]:e["end"]] == e["text"]
