"""Corpus keep-list: the combined quality + dedup + decontamination
verdict table."""

import pytest

from gliner_spark.operators.corpus import corpus_keep_list

GOOD = "the quick brown fox jumps over a lazy dog near the river bank today"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, GOOD),                                # clean
            (2, GOOD),                                # exact dup of 1
            (3, "too short"),                         # fails quality (min words)
            (4, GOOD.replace("river", "ocean")),      # clean variant
        ],
        "doc_id long, text string",
    )


class TestKeepList:
    def test_verdicts_and_reasons(self, spark, docs):
        out = {r.doc_id: r for r in corpus_keep_list(docs).collect()}
        assert out[1].keep and out[1].reasons == []
        assert not out[2].keep and out[2].reasons == ["exact_dup"]
        assert not out[3].keep and out[3].reasons == ["quality"]
        assert out[4].keep

    def test_contamination_reason(self, spark, docs):
        eval_df = spark.createDataFrame(
            [(99, GOOD)], "doc_id long, text string"
        )
        out = {r.doc_id: r for r in corpus_keep_list(docs, eval_df).collect()}
        assert not out[1].keep and "contaminated" in out[1].reasons
        # the dup is both a dup AND contaminated — reasons sorted
        assert out[2].reasons == ["contaminated", "exact_dup"]
        assert out[3].reasons == ["quality"]  # too short to share an 8-gram

    def test_one_row_per_doc(self, docs):
        assert corpus_keep_list(docs).count() == docs.count()
