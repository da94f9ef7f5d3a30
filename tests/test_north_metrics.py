"""North-rule acceptance metrics, stated in the rule's own terms.

The rule: distributed triples must match the reference run at
P/R ≥ 0.95, with byte-identical extracted text per url. In this
sandbox the "reference run" is the single-process kernel (the same
decision semantics as the reference, differential-tested in
test_reference_parity.py); the distributed path must reproduce it
EXACTLY — P = R = F1 = 1.0, comfortably above the 0.95 bar.
"""

import pytest

from pyspark.sql import functions as F

from gliner_spark.model.pipeline import GLiNERPipeline, PipelineConfig
from gliner_spark.operators.evaluation import micro_prf, relex_micro_prf
from gliner_spark.operators.extract import extract_entities, extract_triples
from gliner_spark.sources.pages import pages_df, synth_pages

LABELS = ["person", "organization", "location"]
RELS = ["works_at", "located_in"]
GAZ = {
    "john smith": "person", "mary jones": "person", "li wei": "person",
    "acme corporation": "organization", "globex": "organization",
    "hooli": "organization", "new york": "location", "paris": "location",
    "tokyo": "location", "berlin": "location",
}
PATTERNS = [
    ("person", "works_at", "organization"),
    ("organization", "located_in", "location"),
]
KW = dict(threshold=0.5, gazetteer=GAZ, patterns=PATTERNS)
N = 150


@pytest.fixture(scope="module")
def reference_run():
    """Single-process run — the parity anchor."""
    pipe = GLiNERPipeline(
        LABELS, RELS, PipelineConfig(threshold=0.5),
        gazetteer=GAZ, patterns=PATTERNS,
    )
    ents, rels = [], []
    for r in synth_pages(N):
        e_list, r_list = pipe.predict_triples(r["text"], r["lang"])
        for e in e_list:
            ents.append((r["url"], e["start"], e["end"], e["label"]))
        for rel in r_list:
            rels.append(
                (
                    r["url"], rel["relation"],
                    rel["head"]["start"], rel["head"]["end"],
                    rel["tail"]["start"], rel["tail"]["end"],
                )
            )
    return ents, rels


class TestTriplePR:
    def test_triple_pr_meets_095_bar(self, spark, reference_run):
        _ents, rels = reference_run
        gold = spark.createDataFrame(
            rels,
            "url string, pred string, subj_start int, subj_end int, "
            "obj_start int, obj_end int",
        )
        assert len(rels) > 50, "metric must be computed over a real triple set"
        pred = extract_triples(pages_df(spark, N), LABELS, RELS, **KW)
        m = relex_micro_prf(pred, gold).first()
        assert m.precision >= 0.95 and m.recall >= 0.95
        assert m.precision == 1.0 and m.recall == 1.0  # exact, not just ≥

    def test_entity_pr_exact(self, spark, reference_run):
        ents, _rels = reference_run
        gold = spark.createDataFrame(
            ents, "url string, start int, end int, label string"
        )
        assert len(ents) > 100
        pred = extract_entities(
            pages_df(spark, N), LABELS, threshold=0.5, gazetteer=GAZ
        )
        m = micro_prf(pred, gold).first()
        assert m.f1 == 1.0

    def test_byte_identical_text_per_url(self, spark):
        pages = pages_df(spark, N)
        triples = extract_triples(pages, LABELS, RELS, **KW)
        joined = triples.join(pages, "url")
        bad = joined.where(
            (
                F.expr(
                    "substring(text, subj_start + 1, subj_end - subj_start) != subj_text"
                )
            )
            | (
                F.expr(
                    "substring(text, obj_start + 1, obj_end - obj_start) != obj_text"
                )
            )
        )
        assert bad.count() == 0
