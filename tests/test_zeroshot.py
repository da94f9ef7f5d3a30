"""Zero-shot benchmark harness over CrossNER/MIT-style fixtures."""

import pytest

from gliner_spark.operators.zeroshot import flat_ner_for, zero_shot_benchmark
from gliner_spark.sources.ner_fixtures import (
    fixture_datasets,
    relex_gold_frames,
    word_spans_to_char,
)


class TestFlatNerRule:
    def test_nested_marker_names(self):
        assert not flat_ner_for("ACE_2004")
        assert not flat_ner_for("GENIA_NER")
        assert not flat_ner_for("Corpus-x")
        assert flat_ner_for("CrossNER_music")
        assert flat_ner_for("mit-restaurant")


class TestWordSpanConversion:
    def test_end_inclusive_reference_format(self):
        toks = ["State", "University", "of", "New", "York", "Press"]
        # reference gold: [0, 5, "publisher"] — end-inclusive word idx
        [(s, e, label)] = word_spans_to_char(toks, [(0, 5, "publisher")])
        text = " ".join(toks)
        assert text[s:e] == "State University of New York Press"
        assert label == "publisher"

    def test_inner_span(self):
        toks = ["in", "New", "York", "today"]
        [(s, e, _)] = word_spans_to_char(toks, [(1, 2, "location")])
        assert " ".join(toks)[s:e] == "New York"


class TestHarness:
    @pytest.fixture(scope="class")
    def metrics(self, spark):
        ds = fixture_datasets(spark, n_per_dataset=25)
        return {
            r.dataset: r
            for r in zero_shot_benchmark(
                spark, ds, threshold=0.5, scoring="gazetteer"
            ).collect()
        }

    def test_per_dataset_rows_plus_average(self, metrics):
        assert set(metrics) == {
            "xner_science", "xner_music", "mit_restaurant",
            "ace_nested", "average",
        }

    def test_gazetteer_recall_is_perfect_on_planted_sets(self, metrics):
        for name in ("xner_science", "xner_music", "mit_restaurant"):
            assert metrics[name].recall == 1.0, name
            assert metrics[name].precision == 1.0, name

    def test_nested_dataset_needs_nested_decode(self, spark, metrics):
        # with flat_ner=False (the rule for this dataset), the inner
        # span survives alongside the containing span → recall 1.0
        assert metrics["ace_nested"].recall == 1.0
        # sanity: forcing flat decode would drop nested golds
        ds = fixture_datasets(spark, n_per_dataset=10)
        ds["ace_nested"]["flat_ner"] = True
        flat = {
            r.dataset: r
            for r in zero_shot_benchmark(
                spark, {"ace_nested": ds["ace_nested"]},
                threshold=0.5, scoring="gazetteer",
            ).collect()
        }
        assert flat["ace_nested"].recall < 1.0

    def test_relex_gold_fixture_pipeline_scores_perfectly(self, spark):
        """FIXTURES.md §3 end-to-end: reference-format relex gold
        (word-level ner + index-based relations) → char-offset gold →
        extraction with matching gazetteer/patterns → relex P/R = 1."""
        from gliner_spark.operators.evaluation import relex_micro_prf
        from gliner_spark.operators.extract import extract_triples

        pages, gold = relex_gold_frames(spark, n=20)
        gaz = {
            "alice": "person", "bob": "person", "carol": "person",
            "acme": "organization", "globex": "organization",
            "initech": "organization",
        }
        pred = extract_triples(
            pages, sorted(set(gaz.values())), ["works_at"],
            gazetteer=gaz,
            patterns=[("person", "works_at", "organization")],
            scoring="gazetteer",
            max_pattern_distance=3,  # only adjacent 'X works at Y' pairs
        )
        m = relex_micro_prf(pred, gold).first()
        assert m.n_gold == 20
        assert m.recall == 1.0
        # precision < 1 is allowed (reverse-direction pattern hits), but
        # every gold triple must be recovered exactly
        assert m.tp == m.n_gold

    def test_average_row(self, metrics):
        avg = metrics["average"]
        per = [metrics[n].f1 for n in sorted(
            ("xner_science", "xner_music", "mit_restaurant", "ace_nested")
        )]
        assert avg.f1 == pytest.approx(sum(per) / len(per))
        assert avg.n_pred is None
