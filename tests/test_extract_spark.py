"""Distributed extraction: Spark output ≡ local kernel output.

The parity standard mirrors the reference's packing bench
(bench/bench_gliner_e2e.py:241-248): the distributed path must produce
byte-identical decoded output to the single-process path on the same
input and weights.
"""

import pytest

from pyspark.sql import functions as F

from gliner_spark.model.pipeline import GLiNERPipeline, PipelineConfig
from gliner_spark.operators.extract import extract_entities, extract_triples
from gliner_spark.plans.skew import salted_repartition, length_bucketed
from gliner_spark.sources.pages import pages_df, synth_pages

LABELS = ["person", "organization", "location"]
RELS = ["works_at", "located_in"]
N_PAGES = 120


@pytest.fixture(scope="module")
def pages(spark):
    return pages_df(spark, N_PAGES).cache()


def local_entities():
    pipe = GLiNERPipeline(LABELS, RELS, PipelineConfig(threshold=0.5))
    out = {}
    for r in synth_pages(N_PAGES):
        out[r["url"]] = pipe.predict_entities(r["text"], r["lang"])
    return out


class TestEntityExtraction:
    def test_spark_matches_local_exactly(self, spark, pages):
        expected = local_entities()
        got = extract_entities(pages, LABELS, threshold=0.5).collect()
        got_by_url = {}
        for row in got:
            got_by_url.setdefault(row.url, []).append(row)
        exp_total = sum(len(v) for v in expected.values())
        assert len(got) == exp_total
        for url, ents in expected.items():
            rows = sorted(got_by_url.get(url, []), key=lambda r: (r.start, r.end, r.label))
            exp = sorted(ents, key=lambda e: (e["start"], e["end"], e["label"]))
            assert len(rows) == len(exp), url
            for row, e in zip(rows, exp):
                assert (row.start, row.end, row.text, row.label) == (
                    e["start"], e["end"], e["text"], e["label"],
                )
                assert row.score == pytest.approx(e["score"])

    def test_byte_identical_text_invariant(self, spark, pages):
        ents = extract_entities(pages, LABELS)
        joined = ents.alias("e").join(pages.alias("p"), "url")
        bad = joined.where(
            F.expr("substring(p.text, e.start + 1, e.end - e.start) != e.text")
        )
        assert bad.count() == 0

    def test_empty_and_blank_rows_produce_no_entities(self, spark, pages):
        ents = extract_entities(pages, LABELS)
        blank_urls = [
            r["url"] for r in synth_pages(N_PAGES) if not r["text"].strip()
        ]
        assert len(blank_urls) > 0  # fixture must include them
        hits = ents.where(F.col("url").isin(blank_urls)).count()
        assert hits == 0

    def test_skew_plan_preserves_results(self, spark, pages):
        plain = extract_entities(pages, LABELS)
        salted = extract_entities(
            length_bucketed(salted_repartition(pages, num_partitions=8)), LABELS
        )
        assert plain.count() == salted.count()
        assert (
            plain.exceptAll(salted).count() == 0
            and salted.exceptAll(plain).count() == 0
        )


class TestTripleExtraction:
    def test_spark_matches_local(self, spark, pages):
        pipe = GLiNERPipeline(LABELS, RELS, PipelineConfig(threshold=0.5))
        expected = []
        for r in synth_pages(N_PAGES):
            _e, rels = pipe.predict_triples(r["text"], r["lang"])
            for rel in rels:
                expected.append(
                    (r["url"], rel["head"]["text"], rel["relation"], rel["tail"]["text"])
                )
        got = [
            (row.url, row.subj_text, row.pred, row.obj_text)
            for row in extract_triples(pages, LABELS, RELS, threshold=0.5).collect()
        ]
        assert sorted(got) == sorted(expected)

    def test_triple_schema(self, spark, pages):
        df = extract_triples(pages, LABELS, RELS)
        assert set(df.columns) == {
            "url", "subj_start", "subj_end", "subj_text", "subj_label",
            "pred", "obj_start", "obj_end", "obj_text", "obj_label", "score",
        }
