"""End-to-end pipeline kernel tests (no Spark): determinism, shape,
invariants, relex dataflow."""

import pytest

from gliner_spark.model.pipeline import GLiNERPipeline, PipelineConfig
from gliner_spark.model.encoder import DeterministicEncoder


LABELS = ["person", "organization", "location"]
RELS = ["works_at", "located_in"]
TEXT = (
    "John Smith works at Acme Corporation in New York. "
    "Mary Jones leads the Paris office of Globex."
)


@pytest.fixture(scope="module")
def pipe():
    return GLiNERPipeline(LABELS, RELS, PipelineConfig(threshold=0.6))


class TestDeterminism:
    def test_same_input_same_output(self, pipe):
        a = pipe.predict_entities(TEXT)
        b = pipe.predict_entities(TEXT)
        assert a == b

    def test_fresh_encoder_same_output(self):
        # Cross-process determinism stand-in: two independent encoders.
        p1 = GLiNERPipeline(LABELS, RELS, encoder=DeterministicEncoder())
        p2 = GLiNERPipeline(LABELS, RELS, encoder=DeterministicEncoder())
        assert p1.predict_triples(TEXT) == p2.predict_triples(TEXT)


class TestInvariants:
    def test_byte_identical_text(self, pipe):
        for ent in pipe.predict_entities(TEXT):
            assert TEXT[ent["start"]: ent["end"]] == ent["text"]

    def test_empty_and_blank_filtered(self, pipe):
        assert pipe.predict_entities("") == []
        assert pipe.predict_entities("   \n\t ") == []
        assert pipe.predict_triples(None) == ([], [])  # type: ignore[arg-type]

    def test_labels_deduped(self):
        p = GLiNERPipeline(["person", "person", "org"])
        assert p.labels == ["person", "org"]
        assert p.id_to_class == {1: "person", 2: "org"}

    def test_truncation_to_max_len(self):
        cfg = PipelineConfig(max_len=10)
        p = GLiNERPipeline(LABELS, config=cfg)
        long_text = " ".join(f"w{i}" for i in range(100))
        ents = p.predict_entities(long_text)
        # nothing may reference text beyond the 10th word
        limit_char = long_text.index("w10")
        for e in ents:
            assert e["end"] <= limit_char + len("w10")

    def test_flat_ner_no_overlaps(self, pipe):
        ents = pipe.predict_entities(TEXT)
        ordered = sorted(ents, key=lambda e: e["start"])
        for a, b in zip(ordered, ordered[1:]):
            assert a["end"] <= b["start"]

    def test_scores_above_threshold(self, pipe):
        for ent in pipe.predict_entities(TEXT):
            assert ent["score"] > 0.6


class TestRelex:
    def test_triples_reference_entities(self, pipe):
        ents, rels = pipe.predict_triples(TEXT)
        for r in rels:
            assert r["relation"] in RELS
            for side in ("head", "tail"):
                idx = r[side]["entity_idx"]
                assert 0 <= idx < len(ents)
                assert TEXT[r[side]["start"]: r[side]["end"]] == r[side]["text"]

    def test_no_relations_without_rel_labels(self):
        p = GLiNERPipeline(LABELS, [])
        ents, rels = p.predict_triples(TEXT)
        assert rels == []

    def test_entities_nonempty_on_rich_text(self, pipe):
        # The deterministic encoder fires on a fraction of spans; this
        # guards against degenerate all-or-nothing scoring.
        ents = pipe.predict_entities(TEXT)
        assert 0 < len(ents) < 40


class TestGazetteerTokenizedWidths:
    """Round-2 regression (ADVICE): gazetteer candidate widths must come
    from the REAL tokenizer, not whitespace split — terms with internal
    punctuation ('u.s.', 'at&t') span multiple regex tokens."""

    def test_punctuated_term_matches(self):
        pipe = GLiNERPipeline(
            ["org"],
            config=PipelineConfig(scoring="gazetteer"),
            gazetteer={"at&t": "org", "u.s.": "org"},
        )
        ents = pipe.predict_entities("call AT&T in the U.S. today")
        got = {(e["text"].lower(), e["label"]) for e in ents}
        assert ("at&t", "org") in got
        assert ("u.s.", "org") in got

    def test_plain_terms_still_match(self):
        pipe = GLiNERPipeline(
            ["actor"],
            config=PipelineConfig(scoring="gazetteer"),
            gazetteer={"customer": "actor", "big table": "actor"},
        )
        ents = pipe.predict_entities("the customer saw a big table")
        got = {e["text"] for e in ents}
        assert {"customer", "big table"} <= got


class TestTokenModeArgThreading:
    """Round-2 regression (ADVICE): token mode must honor input_spans
    (D9) and return_class_probs instead of silently dropping them."""

    def _find_token_span(self, pipe, text):
        ents = pipe.predict_entities(text, threshold=0.3)
        assert ents, "need at least one token-mode span for the fixture"
        return ents

    def test_input_spans_restricts_token_mode(self):
        pipe = GLiNERPipeline(
            ["thing", "place"], config=PipelineConfig(mode="token")
        )
        text = "alpha beta gamma delta epsilon zeta"
        ents = self._find_token_span(pipe, text)
        target = ents[0]
        only = pipe.predict_entities(
            text, threshold=0.3, input_spans=[(target["start"], target["end"])]
        )
        assert all(
            (e["start"], e["end"]) == (target["start"], target["end"]) for e in only
        )
        assert any(
            (e["start"], e["end"]) == (target["start"], target["end"]) for e in only
        )
        # a restriction to an empty span list decodes nothing
        assert pipe.predict_entities(text, threshold=0.3, input_spans=[]) == []

    def test_return_class_probs_token_mode(self):
        pipe = GLiNERPipeline(
            ["thing", "place"], config=PipelineConfig(mode="token")
        )
        text = "alpha beta gamma delta epsilon zeta"
        ents = pipe.predict_entities(text, threshold=0.3, return_class_probs=True)
        assert ents
        for e in ents:
            assert e.get("class_probs"), "token mode must attach class_probs"
            assert all(0.0 <= v <= 1.0 for v in e["class_probs"].values())
