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


class TestSaveLoadRoundTrip:
    """save_pretrained / from_pretrained (reference model.py:259-311,
    559-657): the config directory round-trips the whole model — same
    predictions before and after."""

    def test_round_trip_predictions_identical(self, model, tmp_path):
        p = model.save_pretrained(str(tmp_path / "model_dir"))
        assert p.endswith("gliner_spark_config.json")
        loaded = SparkGLiNER.from_pretrained(str(tmp_path / "model_dir"))
        assert loaded.predict_entities(TEXT) == model.predict_entities(TEXT)
        assert loaded.predict_relations(TEXT) == model.predict_relations(TEXT)

    def test_load_from_config_file_path(self, model, tmp_path):
        p = model.save_pretrained(str(tmp_path / "m2"))
        loaded = SparkGLiNER.from_pretrained(p)
        assert loaded.labels == model.labels

    def test_unknown_format_raises(self, tmp_path):
        import json

        bad = tmp_path / "bad.json"
        bad.write_text(json.dumps({"format_version": 99}))
        with pytest.raises(ValueError, match="format"):
            SparkGLiNER.from_pretrained(str(bad))


class TestWithEmbedsVerbs:
    """encode_labels / *_with_embeds — the bi-encoder precompute surface
    (reference model.py:1627-1728)."""

    def test_precomputed_embeds_match_default_path(self):
        m = SparkGLiNER(["person", "organization"], (), PipelineConfig(threshold=0.5))
        embs = m.encode_labels(["person", "organization"])
        a = m.predict_entities(TEXT)
        b = m.predict_with_embeds(TEXT, embs, ["person", "organization"])
        assert a == b  # same embeddings → bit-identical decode

    def test_custom_embeds_change_scores(self):
        import numpy as np

        m = SparkGLiNER(["person"], (), PipelineConfig(threshold=0.5))
        embs = m.encode_labels(["person"])
        base = m.predict_with_embeds(TEXT, embs, ["person"])
        shuffled = np.roll(embs, 3, axis=1)  # a genuinely different vector
        other = m.predict_with_embeds(TEXT, shuffled, ["person"])
        assert base != other  # the override actually reaches scoring

    def test_batch_matches_per_text(self):
        m = SparkGLiNER(["person"], (), PipelineConfig(threshold=0.5))
        embs = m.encode_labels(["person"])
        texts = [TEXT, "nothing to see", ""]
        batch = m.batch_predict_with_embeds(texts, embs, ["person"])
        assert batch == [m.predict_with_embeds(t, embs, ["person"]) for t in texts]

    def test_shape_mismatch_raises(self):
        import numpy as np

        m = SparkGLiNER(["person"], (), PipelineConfig(threshold=0.5))
        with pytest.raises(ValueError, match="shape"):
            m.predict_with_embeds(TEXT, np.zeros((3, 7)), ["person"])

    def test_session_backend_rejects_override(self):
        import numpy as np

        from gliner_spark.model.ort_testing import fake_span_encoder_factory
        from gliner_spark.model.pipeline import GLiNERPipeline

        with pytest.raises(ValueError, match="bi-encoder"):
            GLiNERPipeline(
                ["x"], (), PipelineConfig(),
                encoder=fake_span_encoder_factory(),
                label_embeddings=np.zeros((1, 64)),
            )


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
