"""Block-diagonal packing (X2) — equivalence-tested the same way the
reference proves it (bench/bench_gliner_e2e.py:241-248 asserts
baseline_preds == packed_preds; tests/test_infer_packing.py uses a mock
encoder honoring pair masks, utils_infer.py:26-59)."""

import numpy as np
import pytest

from gliner_spark.kernel.packing import (
    PackedBatch,
    block_diag_mask,
    first_fit_pack,
    pack_batch,
    unpack_hidden,
)


def mixing_encoder(input_ids, attention, pair_mask, dim=8):
    """Mock encoder that HONORS the pair mask: each position's output is
    its own id-embedding plus the mean of the positions it may attend.
    Cross-segment leakage through a wrong mask changes outputs."""
    B, L = input_ids.shape
    rng_base = np.arange(1, dim + 1)[None, None, :]
    emb = (input_ids[:, :, None] * rng_base) % 97 / 97.0  # deterministic per id
    emb = emb * attention[:, :, None]
    out = np.zeros((B, L, dim))
    for b in range(B):
        allowed = pair_mask[b] & (attention[b][None, :] == 1)
        counts = allowed.sum(axis=1, keepdims=True)
        counts = np.maximum(counts, 1)
        out[b] = emb[b] + (allowed @ emb[b]) / counts
    return out * attention[:, :, None]


class TestFirstFit:
    def test_first_fit_order_and_capacity(self):
        streams = first_fit_pack([4, 3, 2, 5, 1], max_length=7)
        assert streams == [[0, 1], [2, 3], [4]]

    def test_overlong_truncates_into_own_stream(self):
        # 100 clamps to 10 and fills stream 0 exactly; 2 opens stream 1
        streams = first_fit_pack([100, 2], max_length=10)
        assert streams == [[0], [1]]

    def test_invalid_max_length(self):
        with pytest.raises(ValueError):
            first_fit_pack([1], 0)


class TestPackUnpack:
    def test_roundtrip_identity(self):
        seqs = [[5, 6, 7], [8, 9], [10, 11, 12, 13], [14]]
        packed = pack_batch(seqs, max_length=6, pad_id=0)
        # every request recoverable byte-for-byte
        recovered = unpack_hidden(packed.input_ids[:, :, None], packed)
        for seq, rec in zip(seqs, recovered):
            assert rec[:, 0].tolist() == seq

    def test_segment_ids_block_structure(self):
        packed = pack_batch([[1, 2], [3], [4, 5, 6]], max_length=3, pad_id=0)
        m = block_diag_mask(packed.segment_ids)
        for b in range(m.shape[0]):
            seg = packed.segment_ids[b]
            for i in range(len(seg)):
                for j in range(len(seg)):
                    assert m[b, i, j] == (seg[i] == seg[j])

    def test_truncation_to_max_length(self):
        packed = pack_batch([list(range(50))], max_length=8)
        assert packed.length_of == [8]
        assert packed.input_ids.shape[1] == 8


class TestPackedEquivalence:
    """The reference's identity standard: packed == baseline outputs."""

    SEQS = [[3, 1, 4, 1, 5], [9, 2, 6], [5, 3, 5, 8, 9, 7], [2], [7, 1, 8, 2]]

    def _baseline(self):
        outs = []
        for seq in self.SEQS:
            ids = np.asarray([seq], dtype=np.int64)
            att = np.ones_like(ids)
            mask = np.ones((1, len(seq), len(seq)), dtype=bool)
            outs.append(mixing_encoder(ids, att, mask)[0])
        return outs

    def test_packed_matches_baseline(self):
        packed = pack_batch(self.SEQS, max_length=8)
        hidden = mixing_encoder(
            packed.input_ids, packed.attention_mask, block_diag_mask(packed.segment_ids)
        )
        unpacked = unpack_hidden(hidden, packed)
        for base, got in zip(self._baseline(), unpacked):
            assert np.allclose(base, got), "packing must be output-identical"

    def test_broken_mask_changes_outputs(self):
        packed = pack_batch(self.SEQS, max_length=8)
        assert max(len(s) for s in first_fit_pack([len(s) for s in self.SEQS], 8)) > 1
        all_ones = np.ones(
            (packed.input_ids.shape[0],) + (packed.input_ids.shape[1],) * 2, dtype=bool
        )
        hidden = mixing_encoder(packed.input_ids, packed.attention_mask, all_ones)
        unpacked = unpack_hidden(hidden, packed)
        diffs = [
            not np.allclose(base, got)
            for base, got in zip(self._baseline(), unpacked)
        ]
        assert any(diffs), "cross-segment leakage must be detectable"

    def test_packed_determinism(self):
        packed1 = pack_batch(self.SEQS, max_length=8)
        packed2 = pack_batch(self.SEQS, max_length=8)
        assert np.array_equal(packed1.input_ids, packed2.input_ids)
        assert np.array_equal(packed1.segment_ids, packed2.segment_ids)
        assert packed1.stream_of == packed2.stream_of


class TestInferencePackingConfig:
    """configure_inference_packing (reference model.py:217-227): token-
    budget session sub-batches, output-identical to fixed batching."""

    def _model(self):
        from gliner_spark.model import PipelineConfig, SparkGLiNER
        from gliner_spark.model.ort_testing import fake_span_encoder_factory
        from gliner_spark.model.pipeline import GLiNERPipeline

        m = SparkGLiNER.__new__(SparkGLiNER)
        m.labels = ["thing"]
        m.relations = []
        m.config = PipelineConfig(threshold=0.5)
        m.gazetteer = None
        m.patterns = None
        m._pipe = GLiNERPipeline(
            ["thing"], [], m.config, encoder=fake_span_encoder_factory()
        )
        return m

    TEXTS = [
        "alpha beta gamma delta epsilon zeta",
        "one two",
        "a much longer document with many more words than the others here",
        "tiny",
        "mid size doc right here",
    ]

    def test_output_identical_with_and_without_packing(self):
        from gliner_spark.kernel.packing import InferencePackingConfig

        m = self._model()
        base = m._pipe.predict_entities_batch(self.TEXTS)
        m.configure_inference_packing(
            InferencePackingConfig(max_length=8, streams_per_batch=2)
        )
        packed = m._pipe.predict_entities_batch(self.TEXTS)
        assert base == packed
        m.configure_inference_packing(None)
        assert m._pipe.predict_entities_batch(self.TEXTS) == base

    def test_chunks_respect_token_budget(self):
        from gliner_spark.kernel.packing import InferencePackingConfig

        m = self._model()
        pipe = m._pipe
        pipe.configure_inference_packing(
            InferencePackingConfig(max_length=10, streams_per_batch=1)
        )
        prepared = []
        for i, t in enumerate(self.TEXTS):
            tokens, s, e = pipe._prepare(t, "en")
            prepared.append((i, tokens, s, e))
        order = sorted(range(len(prepared)), key=lambda j: -len(prepared[j][1]))
        chunks = list(pipe._session_chunks(order, prepared))
        assert sorted(j for c in chunks for j in c) == sorted(order)
        for c in chunks:
            total = sum(len(prepared[j][1]) for j in c)
            assert total <= 10 or len(c) == 1  # over-long doc rides alone
