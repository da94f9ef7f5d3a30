"""Multitask prompt-pipeline operators (reference gliner/multitask/*)."""

import pytest

from gliner_spark.operators.multitask import (
    answer_questions,
    classify_documents,
    open_extract,
    prompt_mode_relations,
    summarize_documents,
)

GAZ = {
    "spark": "technology",
    "acme corporation": "organization",
    "john smith": "person",
}


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("u0", "john smith works at acme corporation using spark daily"),
        ("u1", "spark spark spark is mentioned here often indeed"),
        ("u2", "nothing relevant appears in this row at all"),
    ]
    return spark.createDataFrame(rows, "url string, text string")


class TestClassification:
    def test_argmax_class_per_doc(self, docs):
        got = {
            r.url: (r.label, r.score)
            for r in classify_documents(
                docs, ["technology", "organization", "person"],
                gazetteer=GAZ, threshold=0.25, scoring="gazetteer",
            ).collect()
        }
        # u1 only contains 'spark' → technology
        assert got["u1"][0] == "technology"
        assert "u2" not in got or got["u2"][1] < 0.9
        assert got["u0"][0] in {"technology", "organization", "person"}

    def test_multi_label_mode(self, docs):
        got = [
            r
            for r in classify_documents(
                docs, ["technology", "organization", "person"],
                gazetteer=GAZ, threshold=0.5, multi_label=True,
                scoring="gazetteer",
            ).collect()
            if r.url == "u0"
        ]
        assert {r.label for r in got} >= {"technology", "organization", "person"}


class TestQA:
    def test_answer_offsets_into_original_text(self, docs):
        from pyspark.sql import functions as F

        got = answer_questions(
            docs.withColumn("question", F.lit("who is the employer?")),
            gazetteer={"acme corporation": "answer"},
            threshold=0.5,
            scoring="gazetteer",
        ).collect()
        rows = [r for r in got if r.url == "u0"]
        assert len(rows) == 1
        r = rows[0]
        text = "john smith works at acme corporation using spark daily"
        assert text[r.start:r.end] == r.answer == "acme corporation"

    def test_prompt_region_spans_dropped(self, spark):
        # the question itself contains the gazetteer surface; any match
        # inside the prompt must not leak into the output
        df = spark.createDataFrame(
            [("u", "no match here in the body text", "where is acme corporation?")],
            "url string, text string, question string",
        )
        got = answer_questions(
            df,
            gazetteer={"acme corporation": "answer"},
            threshold=0.5,
            scoring="gazetteer",
        ).collect()
        assert got == []


class TestSummarization:
    def test_topk_spans_in_document_order(self, docs):
        got = {
            r.url: r
            for r in summarize_documents(
                docs,
                top_k=2,
                gazetteer={"john smith": "summary", "spark": "summary"},
                threshold=0.5,
                scoring="gazetteer",
            ).collect()
        }
        r = got["u0"]
        assert r.n_spans == 2
        assert r.summary == "john smith spark"  # document order, not score order


class TestOpenIE:
    def test_prompt_prefix_and_offsets(self, docs):
        got = [
            r
            for r in open_extract(
                docs,
                prompt="Extract every technology mention:",
                gazetteer={"spark": "match"},
                threshold=0.5,
                scoring="gazetteer",
            ).collect()
            if r.url == "u0"
        ]
        assert len(got) == 1
        text = "john smith works at acme corporation using spark daily"
        r = got[0]
        assert text[r.start:r.end] == r.text == "spark"


class TestPromptModeRelex:
    def test_two_pass_head_tail_decode(self, docs):
        got = prompt_mode_relations(
            docs,
            relations=["works_at"],
            mention_gazetteer={"john smith": "person"},
            pair_gazetteer={"acme corporation": "john smith <> works_at"},
            threshold=0.5,
        ).collect()
        rows = [r for r in got if r.url == "u0"]
        assert len(rows) == 1
        r = rows[0]
        assert (r.subj_text, r.pred, r.obj_text) == (
            "john smith", "works_at", "acme corporation"
        )
        text = "john smith works at acme corporation using spark daily"
        assert text[r.obj_start:r.obj_end] == r.obj_text

    def test_no_heads_no_relations(self, docs):
        got = prompt_mode_relations(
            docs,
            relations=["works_at"],
            mention_gazetteer={"zzz": "person"},
            pair_gazetteer={},
            threshold=0.5,
        ).collect()
        assert got == []
