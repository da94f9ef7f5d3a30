"""D9 input-span restriction + P6 char→word alignment + D4 class probs
through the distributed operator."""

import pytest

from pyspark.sql import functions as F

from gliner_spark.model.pipeline import GLiNERPipeline, PipelineConfig
from gliner_spark.operators.extract import extract_entities

GAZ = {"john smith": "person", "acme corporation": "organization"}
TEXT = "john smith works at acme corporation daily"


class TestInputSpansKernel:
    @pytest.fixture(scope="class")
    def pipe(self):
        return GLiNERPipeline(
            ["person", "organization"],
            [],
            PipelineConfig(threshold=0.5, scoring="gazetteer"),
            gazetteer=GAZ,
        )

    def test_restricts_to_given_spans(self, pipe):
        # only the john smith span offered → acme must not appear
        out = pipe.predict_entities(TEXT, input_spans=[(0, 10)])
        assert [e["text"] for e in out] == ["john smith"]

    def test_non_aligned_span_silently_dropped(self, pipe):
        # (1, 10) starts mid-token → P6 drops it; nothing decodable
        out = pipe.predict_entities(TEXT, input_spans=[(1, 10)])
        assert out == []

    def test_empty_restriction_blocks_everything(self, pipe):
        assert pipe.predict_entities(TEXT, input_spans=[]) == []

    def test_class_probs_attached(self, pipe):
        out = pipe.predict_entities(TEXT, return_class_probs=True)
        assert out, "gazetteer spans expected"
        for e in out:
            assert "class_probs" in e
            assert e["label"] in e["class_probs"]
            assert e["class_probs"][e["label"]] == pytest.approx(e["score"])


class TestInputSpansOperator:
    def test_spans_col_and_class_probs(self, spark):
        df = spark.createDataFrame(
            [("u0", TEXT, [{"start": 0, "end": 10}]),
             ("u1", TEXT, [{"start": 20, "end": 36}])],
            "url string, text string, spans array<struct<start int, end int>>",
        )
        got = extract_entities(
            df, ["person", "organization"],
            gazetteer=GAZ, scoring="gazetteer",
            spans_col="spans", return_class_probs=True,
        ).collect()
        by_url = {r.url: r for r in got}
        assert len(got) == 2
        assert by_url["u0"].text == "john smith"
        assert by_url["u1"].text == "acme corporation"
        assert by_url["u0"].class_probs["person"] == pytest.approx(
            by_url["u0"].score
        )
