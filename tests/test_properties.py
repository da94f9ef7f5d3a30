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


class TestPackingProperties:
    """Hypothesis: packing is identity-preserving for ANY sequence set."""

    @given(
        seqs=st.lists(
            st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=12),
            min_size=1,
            max_size=8,
        ),
        max_len=st.integers(min_value=4, max_value=20),
    )
    @settings(max_examples=60, deadline=None)
    def test_pack_roundtrip_and_mask_identity(self, seqs, max_len):
        import numpy as np

        from gliner_spark.kernel.packing import (
            block_diag_mask,
            pack_batch,
            unpack_hidden,
        )
        from tests.test_packing import mixing_encoder

        packed = pack_batch(seqs, max_length=max_len)
        # roundtrip: every request recoverable (after truncation)
        rec = unpack_hidden(packed.input_ids[:, :, None], packed)
        for seq, r in zip(seqs, rec):
            assert r[:, 0].tolist() == list(seq)[:max_len]
        # identity: packed outputs == per-doc baseline under the mask
        hidden = mixing_encoder(
            packed.input_ids, packed.attention_mask, block_diag_mask(packed.segment_ids)
        )
        unpacked = unpack_hidden(hidden, packed)
        for seq, got in zip(seqs, unpacked):
            t = list(seq)[:max_len]
            ids = np.asarray([t], dtype=np.int64)
            base = mixing_encoder(
                ids, np.ones_like(ids), np.ones((1, len(t), len(t)), dtype=bool)
            )[0]
            assert np.allclose(base, got)


class TestSubwordFeedProperties:
    """Hypothesis: the ONNX feed is well-formed for ANY word batch."""

    @given(
        batch=st.lists(
            st.lists(
                st.text(
                    alphabet=st.characters(
                        blacklist_categories=("Cs",), blacklist_characters=""
                    ),
                    min_size=1,
                    max_size=12,
                ),
                min_size=1,
                max_size=15,
            ),
            min_size=1,
            max_size=4,
        ),
        n_labels=st.integers(min_value=1, max_value=4),
    )
    @settings(max_examples=50, deadline=None)
    def test_feed_invariants(self, batch, n_labels):
        import numpy as np

        from gliner_spark.model.onnx_backend import build_span_feed
        from gliner_spark.model.subword import DeterministicSubwordTokenizer

        labels = [f"label{i}" for i in range(n_labels)]
        feed, meta = build_span_feed(batch, labels, DeterministicSubwordTokenizer(), max_width=5)
        B = len(batch)
        wm = feed["words_mask"]
        att = feed["attention_mask"]
        ids = feed["input_ids"]
        assert meta.prompt_len == 2 * n_labels + 1
        for b, words in enumerate(batch):
            # one nonzero mask entry per TEXT word, numbered 1..len
            nz = wm[b][wm[b] > 0]
            assert nz.tolist() == list(range(1, len(words) + 1))
            # mask nonzero only where attention is on
            assert (att[b][wm[b] > 0] == 1).all()
            # every row has exactly n_labels ENT markers
            assert (ids[b] == DeterministicSubwordTokenizer.ENT_TOKEN_ID).sum() == n_labels
            # span grid covers exactly L*K real spans
            L = meta.word_counts[b]
            assert feed["span_mask"][b].sum() == sum(
                1 for s in range(L) for k in range(5) if s + k < L
            )


class TestUniversalSplitterLaws:
    """The universal auto-detect splitter must preserve the offset
    integrity law for ANY text regardless of which backend (or the
    regex fallback) the detector routes to."""

    @given(
        st.text(
            alphabet=st.characters(max_codepoint=0xFFFF),
            max_size=150,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_universal_offsets_slice_back(self, text):
        from gliner_spark.kernel.tokenization import _universal_splitter

        for tok, s, e in _universal_splitter(text):
            assert text[s:e] == tok  # byte-identical slice invariant
            assert 0 <= s < e <= len(text)

    @given(st.text(max_size=100))
    @settings(max_examples=100, deadline=None)
    def test_detect_lang_total_and_deterministic(self, text):
        from gliner_spark.kernel.tokenization import _detect_lang

        a = _detect_lang(text)
        assert a == _detect_lang(text)
        assert isinstance(a, str) and a
