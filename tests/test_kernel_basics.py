"""Tokenizer / span-enumeration / prompt / charmap kernel tests.

Mirrors reference semantics: tokenizer.py:49 regex, utils.py:215-252
span enumeration, processor.py:179-197 prompts, model.py:1281-1331
char mapping (byte-identical text invariant).
"""

import numpy as np
import pytest
from hypothesis import given, strategies as st

from gliner_spark.kernel.tokenization import word_tokenize, tokenize_with_offsets
from gliner_spark.kernel.spans import make_mapping, prepare_span_idx, span_idx_array
from gliner_spark.kernel.prompts import (
    ENT_TOKEN,
    REL_TOKEN,
    SEP_TOKEN,
    build_entity_prompt,
    build_relex_prompt,
)
from gliner_spark.kernel.decoding import Span
from gliner_spark.kernel.charmap import format_relations, map_spans_to_char


class TestTokenizer:
    def test_hyphen_underscore_compounds(self):
        toks = [t for t, _, _ in word_tokenize("state-of-the_art systems")]
        assert toks == ["state-of-the_art", "systems"]

    def test_punctuation_separate_tokens(self):
        toks = [t for t, _, _ in word_tokenize("Hello, world!")]
        assert toks == ["Hello", ",", "world", "!"]

    def test_offsets_slice_back(self):
        text = "The  quick—brown fox."
        for tok, s, e in word_tokenize(text):
            assert text[s:e] == tok

    def test_unicode_word_chars(self):
        # Python \w is unicode: matches the reference exactly.
        toks = [t for t, _, _ in word_tokenize("héllo 你好 мир")]
        assert toks == ["héllo", "你好", "мир"]

    @given(st.text(max_size=200))
    def test_offsets_always_consistent(self, text):
        tokens, starts, ends = tokenize_with_offsets(text)
        for t, s, e in zip(tokens, starts, ends):
            assert text[s:e] == t
        assert starts == sorted(starts)


class TestSpanEnumeration:
    def test_generates_all_spans_within_width(self):
        # Mirrors tests/test_data_processing.py:359 + utils.py docstring.
        assert prepare_span_idx(3, 2) == [(0, 0), (0, 1), (1, 1), (1, 2), (2, 2), (2, 3)]

    def test_spans_can_exceed_sequence(self):
        spans = prepare_span_idx(2, 3)
        assert (1, 3) in spans  # validity deferred to decode

    def test_array_version_matches(self):
        for L, K in [(0, 3), (1, 1), (5, 12)]:
            assert [tuple(r) for r in span_idx_array(L, K)] == prepare_span_idx(L, K)


class TestMakeMapping:
    def test_dedup_preserves_order_one_indexed(self):
        fwd, rev = make_mapping(["PERSON", "ORG", "LOC", "PERSON"])
        assert fwd == {"PERSON": 1, "ORG": 2, "LOC": 3}
        assert rev == {1: "PERSON", 2: "ORG", 3: "LOC"}


class TestPrompts:
    def test_entity_prompt_shape(self):
        seq, plen = build_entity_prompt(["John", "runs"], ["person", "org"])
        assert seq == [ENT_TOKEN, "person", ENT_TOKEN, "org", SEP_TOKEN, "John", "runs"]
        assert plen == 5

    def test_relex_prompt_two_blocks(self):
        seq, plen = build_relex_prompt(["x"], ["person"], ["works_at"])
        assert seq == [
            ENT_TOKEN, "person", SEP_TOKEN, REL_TOKEN, "works_at", SEP_TOKEN, "x",
        ]
        assert plen == 6


class TestCharMap:
    def test_byte_identical_text(self):
        text = "John  Smith works at Acme-Corp."
        tokens, starts, ends = tokenize_with_offsets(text)
        spans = [Span(0, 1, "person", 0.9), Span(4, 4, "org", 0.8)]
        ents = map_spans_to_char(spans, text, starts, ends)
        assert ents[0]["text"] == "John  Smith"
        assert ents[1]["text"] == "Acme-Corp"
        for e in ents:
            assert text[e["start"]: e["end"]] == e["text"]

    def test_format_relations_provenance(self):
        text = "John works at Acme."
        tokens, starts, ends = tokenize_with_offsets(text)
        spans = [Span(0, 0, "person", 0.9), Span(3, 3, "org", 0.8)]
        rels = format_relations([(0, "works_at", 1, 0.7)], spans, text, starts, ends)
        assert rels[0]["head"]["text"] == "John"
        assert rels[0]["tail"]["text"] == "Acme"
        assert rels[0]["relation"] == "works_at"
        assert rels[0]["head"]["entity_idx"] == 0

    def test_format_relations_skips_out_of_range(self):
        text = "a b"
        tokens, starts, ends = tokenize_with_offsets(text)
        spans = [Span(0, 0, "x", 0.9)]
        rels = format_relations([(0, "r", 5, 0.9)], spans, text, starts, ends)
        assert rels == []
