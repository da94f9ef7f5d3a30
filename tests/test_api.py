"""SparkGLiNER facade: reference-shaped verbs over the Spark pipeline."""

import pytest

from gliner_spark.model import PipelineConfig, SparkGLiNER
from gliner_spark.operators.zeroshot import sample_train_mix

GAZ = {"john smith": "person", "acme corporation": "organization"}
PATTERNS = [("person", "works_at", "organization")]
TEXT = "john smith works at acme corporation daily"


@pytest.fixture(scope="module")
def model():
    return SparkGLiNER(
        ["person", "organization"], ["works_at"],
        PipelineConfig(threshold=0.5, scoring="gazetteer"),
        gazetteer=GAZ, patterns=PATTERNS,
    )


class TestSingleDocVerbs:
    def test_predict_entities(self, model):
        ents = model.predict_entities(TEXT)
        assert [(e["text"], e["label"]) for e in ents] == [
            ("john smith", "person"), ("acme corporation", "organization"),
        ]

    def test_predict_relations(self, model):
        rels = model.predict_relations(TEXT)
        assert len(rels) == 1
        assert rels[0]["relation"] == "works_at"
        assert rels[0]["head"]["text"] == "john smith"

    def test_inference_batches(self, model):
        out = model.inference([TEXT, "", "nothing here"])
        assert len(out) == 3
        assert len(out[0]) == 2 and out[1] == []

    def test_label_override_builds_new_pipe(self, model):
        ents = model.predict_entities(TEXT, labels=["person"])
        assert [e["label"] for e in ents] == ["person"]


class TestTableVerbs:
    def test_batch_predict_and_evaluate(self, spark, model):
        pages = spark.createDataFrame(
            [("u0", TEXT, "en"), ("u1", "no entities here at all", "en")],
            "url string, text string, lang string",
        )
        ents = model.batch_predict_entities(pages)
        assert ents.count() == 2
        gold = ents  # self-evaluation → perfect scores
        m = model.evaluate(ents, gold).first()
        assert m.precision == 1.0 and m.recall == 1.0 and m.f1 == 1.0

    def test_batch_triples(self, spark, model):
        pages = spark.createDataFrame(
            [("u0", TEXT, "en")], "url string, text string, lang string"
        )
        rows = model.batch_predict_triples(pages).collect()
        assert len(rows) == 1
        assert rows[0].pred == "works_at"


class TestTrainMixSampler:
    def test_per_dataset_cap_and_union(self, spark):
        a = spark.range(100).withColumnRenamed("id", "x")
        b = spark.range(30).withColumnRenamed("id", "x")
        mixed = sample_train_mix([a, b], per_dataset=20)
        assert mixed.count() == 40  # 20 + min(30, 20)
        # deterministic across invocations
        s1 = sorted(r.x for r in sample_train_mix([a, b], per_dataset=20).collect())
        s2 = sorted(r.x for r in sample_train_mix([a, b], per_dataset=20).collect())
        assert s1 == s2
