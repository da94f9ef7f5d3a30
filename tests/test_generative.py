"""M15/D10 — generative label decoding + labels trie.

The trie is differential-tested LIVE against the reference's own
pure-Python implementation (gliner/decoding/trie/python_labels_trie.py,
executable without torch): randomized add/get/remove programs must
agree exactly, including child ORDER and the permanence semantics of
remove_entity.
"""

import importlib.util
import random

import numpy as np
import pytest

from gliner_spark.kernel.labels_trie import LabelsTrie
from gliner_spark.model.encoder import DeterministicEncoder
from gliner_spark.model.generative import (
    BOS_ID,
    EOS_ID,
    GenerativeLabelDecoder,
    LabelTokenizer,
    build_labels_trie,
    build_span_label_map,
    updated_id_to_classes,
)
from gliner_spark.model.pipeline import GLiNERPipeline, PipelineConfig

REF_TRIE = "/root/reference/gliner/decoding/trie/python_labels_trie.py"


def _load_reference_trie():
    spec = importlib.util.spec_from_file_location("ref_labels_trie", REF_TRIE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.LabelsTrie


# ---------------------------------------------------------------------------
# trie
# ---------------------------------------------------------------------------


class TestLabelsTrie:
    def test_basic_get(self):
        t = LabelsTrie([[5, 6, 2], [5, 7, 2], [8, 2]])
        assert t.get([]) == [5, 8]
        assert t.get([5]) == [6, 7]
        assert t.get([5, 6]) == [2]
        assert t.get([5, 6, 2]) == []  # leaf
        assert t.get([9]) == []  # off-trie

    def test_insertion_order_preserved(self):
        t = LabelsTrie([[3], [1], [2]])
        assert t.get([]) == [3, 1, 2]

    def test_remove_respects_permanence(self):
        # constructor entries are permanent; dynamic adds are not
        t = LabelsTrie([[1, 2, 3]])
        t.add([1, 2, 4])
        t.remove_entity([1, 2, 4])
        assert t.get([1, 2]) == [3]  # dynamic branch gone
        t.remove_entity([1, 2, 3])
        assert t.get([1, 2]) == [3]  # permanent branch survives

    def test_remove_stops_at_shared_prefix(self):
        t = LabelsTrie()
        t.add([1, 2, 3])
        t.add([1, 2, 5])
        t.remove_entity([1, 2, 3])
        assert t.get([1, 2]) == [5]
        assert t.get([1]) == [2]

    def test_reference_differential_random_programs(self):
        """Random op programs through ours AND the reference's trie —
        every get must match exactly (order included)."""
        RefTrie = _load_reference_trie()
        rng = random.Random(20260817)
        for trial in range(60):
            init = [
                [rng.randrange(1, 9) for _ in range(rng.randrange(1, 5))]
                for _ in range(rng.randrange(0, 5))
            ]
            ours, ref = LabelsTrie(init), RefTrie(init)
            for _ in range(30):
                seq = [rng.randrange(1, 9) for _ in range(rng.randrange(1, 5))]
                op = rng.randrange(4)
                if op == 0:
                    ours.add(seq)
                    ref.add(seq)
                elif op == 1:
                    ours.remove_entity(seq)
                    ref.remove_entity(seq)
                elif op == 2:
                    batch = [seq, seq[::-1]]
                    ours.add_batch(batch)
                    ref.add_batch(batch)
                else:
                    ours.remove_batch([seq])
                    ref.remove_batch([seq])
                probe = [rng.randrange(1, 9) for _ in range(rng.randrange(0, 4))]
                assert ours.get(probe) == ref.get(probe), (trial, probe)
                assert ours.get(seq[:-1]) == ref.get(seq[:-1]), (trial, seq)


# ---------------------------------------------------------------------------
# tokenizer + trie construction
# ---------------------------------------------------------------------------


class TestLabelTokenizer:
    def test_roundtrip_and_bos(self):
        tok = LabelTokenizer(["famous person", "city"])
        ids = tok.encode("famous person")
        assert ids[0] == BOS_ID
        assert tok.decode(ids) == "famous person"

    def test_vocab_order_independent(self):
        a = LabelTokenizer(["alpha beta", "gamma"])
        b = LabelTokenizer(["gamma", "alpha beta"])
        assert a.word_to_id == b.word_to_id

    def test_closed_vocabulary_raises(self):
        tok = LabelTokenizer(["city"])
        with pytest.raises(KeyError):
            tok.encode("unknown words")

    def test_build_labels_trie_strips_bos_appends_eos(self):
        # model.py:2107-2131: strip BOS, append EOS before insertion
        tok = LabelTokenizer(["famous person", "famous event"])
        trie = build_labels_trie(["famous person", "famous event"], tok)
        first = trie.get([])
        assert first == [tok.word_to_id["famous"]]  # BOS stripped
        after = trie.get([tok.word_to_id["famous"], tok.word_to_id["person"]])
        assert after == [EOS_ID]  # EOS appended


# ---------------------------------------------------------------------------
# generation
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def decoder():
    enc = DeterministicEncoder(dim=64, seed=42)
    labels = ["famous person", "business organization", "geographic location"]
    return GenerativeLabelDecoder(enc, LabelTokenizer(labels)), labels, enc


class TestGeneration:
    def test_constrained_outputs_are_constraint_members(self, decoder):
        dec, labels, enc = decoder
        vecs = np.stack([enc.token_embedding(f"s{i}") for i in range(6)])
        out = dec.generate_labels(vecs, constraints=labels, num_return_sequences=2)
        assert len(out) == 12  # B * n, flat row-major
        assert set(out) <= set(labels)

    def test_n_best_distinct_per_prefix(self, decoder):
        dec, labels, enc = decoder
        seqs = dec.generate(
            enc.token_embedding("x"),
            trie=build_labels_trie(labels, dec.tokenizer),
            num_return_sequences=3,
        )
        assert len(seqs) == 3
        assert len({tuple(s) for s in seqs}) == 3

    def test_deterministic_across_instances(self):
        labels = ["famous person", "city of lights"]
        outs = []
        for _ in range(2):
            enc = DeterministicEncoder(dim=64, seed=42)
            dec = GenerativeLabelDecoder(enc, LabelTokenizer(labels))
            vec = enc.token_embedding("probe")
            outs.append(dec.generate_labels(vec[None, :], constraints=labels))
        assert outs[0] == outs[1]

    def test_unconstrained_terminates_within_budget(self, decoder):
        dec, _labels, enc = decoder
        out = dec.generate(enc.token_embedding("y"), max_new_tokens=4)
        assert len(out) == 1 and len(out[0]) <= 4

    def test_off_trie_prefix_forces_eos(self, decoder):
        dec, labels, _enc = decoder
        trie = build_labels_trie(labels, dec.tokenizer)
        # a leaf (after EOS consumed) yields [], decoder must emit EOS →
        # empty continuation rather than crash
        seqs = dec.generate(np.zeros(64), trie=LabelsTrie(), num_return_sequences=1)
        assert seqs == [[]]


# ---------------------------------------------------------------------------
# decode bookkeeping (decoder.py:415-490 single-document semantics)
# ---------------------------------------------------------------------------


class TestDecodeBookkeeping:
    def test_span_label_map_grouping(self):
        m = build_span_label_map([4, 17], ["a", "b", "c", "d"], 2)
        assert m == {4: ["a", "b"], 17: ["c", "d"]}

    def test_updated_id_to_classes(self):
        got = updated_id_to_classes({1: "person", 2: "org"}, ["gen1", "gen2"])
        assert got == {1: "gen1", 2: "gen2"}


# ---------------------------------------------------------------------------
# pipeline integration
# ---------------------------------------------------------------------------


GAZ = {"john smith": "person", "acme corporation": "organization"}
CONSTRAINTS = ["famous person", "company", "city"]


class TestPipelineGenerative:
    def _pipe(self):
        return GLiNERPipeline(
            ["person", "organization", "location"],
            config=PipelineConfig(threshold=0.5),
            gazetteer=GAZ,
        )

    def test_span_mode_attaches_generated_labels(self):
        ents = self._pipe().predict_entities_generative(
            "john smith works at acme corporation",
            gen_constraints=CONSTRAINTS,
            num_gen_sequences=2,
        )
        assert len(ents) == 2
        for e in ents:
            assert len(e["generated_labels"]) == 2
            assert set(e["generated_labels"]) <= set(CONSTRAINTS)
        # byte-identical text invariant holds on this path too
        assert ents[0]["text"] == "john smith"

    def test_prompt_mode_replaces_labels(self):
        ents = self._pipe().predict_entities_generative(
            "john smith works at acme corporation",
            decoder_mode="prompt",
            gen_constraints=CONSTRAINTS,
        )
        assert len(ents) == 2
        for e in ents:
            assert e["label"] in CONSTRAINTS  # generated name replaced it
            assert "generated_labels" not in e  # span_label_map stays empty

    def test_empty_text(self):
        assert self._pipe().predict_entities_generative("") == []
        assert self._pipe().predict_entities_generative("   ") == []

    def test_unknown_mode_raises(self):
        with pytest.raises(ValueError):
            self._pipe().predict_entities_generative("x", decoder_mode="nope")

    def test_session_backend_rejected(self):
        from gliner_spark.model.ort_testing import fake_span_encoder_factory

        pipe = GLiNERPipeline(
            ["person"], config=PipelineConfig(threshold=0.5),
            encoder=fake_span_encoder_factory(),
        )
        with pytest.raises(NotImplementedError):
            pipe.predict_entities_generative("john smith")

    def test_matches_plain_decode_spans(self):
        """Generation must not perturb which spans decode: same spans,
        same scores as predict_entities."""
        pipe = self._pipe()
        text = "john smith works at acme corporation"
        plain = pipe.predict_entities(text)
        gen = pipe.predict_entities_generative(
            text, gen_constraints=CONSTRAINTS
        )
        strip = lambda es: [
            (e["start"], e["end"], e["text"], e["label"], e["score"]) for e in es
        ]
        assert strip(plain) == strip(gen)
