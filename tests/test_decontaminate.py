"""Train/test decontamination (GPT-3-style n-gram pass)."""

import pytest

from pyspark.sql import functions as F

from gliner_spark.operators.decontaminate import contamination_flags, decontaminate


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated text about apples and oranges here now"),
            (3, "prefix words then the quick brown fox jumps over the lazy dog"),
            (4, "quick brown fox but only a fragment of it"),
        ],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def eval_df(spark):
    return spark.createDataFrame(
        [(100, "someone said the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )


class TestContaminationFlags:
    def test_flags_and_counts(self, corpus, eval_df):
        out = {r.doc_id: r for r in contamination_flags(corpus, eval_df, n=8).collect()}
        assert out[1].contaminated and out[1].n_hits >= 1  # full 8-gram overlap
        assert not out[2].contaminated and out[2].n_hits == 0
        assert out[3].contaminated  # the leaked span sits mid-document
        assert not out[4].contaminated  # 3-word fragment < n-gram width
        assert len(out) == 4  # one row per corpus doc

    def test_decontaminate_drops_only_dirty(self, corpus, eval_df):
        clean = decontaminate(corpus, eval_df, n=8)
        assert sorted(r.doc_id for r in clean.collect()) == [2, 4]
        assert clean.columns == corpus.columns  # original schema intact

    def test_eval_side_is_broadcast(self, corpus, eval_df):
        from tests.test_plans_quality import formatted_plan

        plan = formatted_plan(contamination_flags(corpus, eval_df, n=8))
        assert "BroadcastHashJoin" in plan  # corpus never shuffles for the probe


class TestShinglesShortTextGuard:
    def test_short_text_yields_empty_not_garbage(self, spark):
        from gliner_spark.functions.text import shingles

        df = spark.createDataFrame([("a b",)], "text string")
        out = df.select(shingles(F.col("text"), 3).alias("s")).first().s
        assert out == []  # not a descending-sequence artifact

    def test_exact_length_text_yields_one(self, spark):
        from gliner_spark.functions.text import shingles

        df = spark.createDataFrame([("a b c",)], "text string")
        out = df.select(shingles(F.col("text"), 3).alias("s")).first().s
        assert out == ["a b c"]
