"""NER-composed PII redaction (operators/redact.py + the text_pii_ner
gate composition): names the regex classes cannot see are spliced out
by the extraction pipeline, regexes then scrub the classes they do see.
"""

import pandas as pd

from pyspark.sql import functions as F

from gliner_spark.functions.pii import redact_pii
from gliner_spark.operators.redact import redact_entity_mentions

GAZ = {"alice": "person", "acme": "organization"}
LABELS = sorted(set(GAZ.values()))


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


class TestRedactEntityMentions:
    def test_name_redacted_that_regexes_miss(self, spark):
        """The VERDICT-r4 done-condition verbatim: a regex-only scrub
        leaves a personal name in place; the NER-composed pass redacts
        it (and the regex classes still catch the email)."""
        text = "alice wrote to bob@mail.example about acme"
        df = _pages(spark, [("d1", text)])
        # regex-only: the name survives
        regex_only = df.select(redact_pii(F.col("text")).alias("t")).first()["t"]
        assert "alice" in regex_only and "<EMAIL>" in regex_only
        # composed: NER splice first, regex second
        red = redact_entity_mentions(
            df, labels=LABELS, gazetteer=GAZ, scoring="gazetteer",
            lang_col=None,
        )
        out = red.select(
            "url", "n_ner_redactions",
            redact_pii(F.col("redacted_text")).alias("clean"),
        ).first()
        assert out["n_ner_redactions"] == 2
        assert out["clean"] == "<PERSON> wrote to <EMAIL> about <ORGANIZATION>"

    def test_splice_is_byte_exact_outside_mentions(self, spark):
        """Everything outside the mention spans passes through
        untouched — tabs, doubled spaces, unicode, punctuation."""
        text = "x\té  alice ,, acme !"
        out = redact_entity_mentions(
            _pages(spark, [("d", text)]), labels=LABELS, gazetteer=GAZ,
            scoring="gazetteer", lang_col=None,
        ).first()
        assert out["redacted_text"] == "x\té  <PERSON> ,, <ORGANIZATION> !"

    def test_no_mentions_is_identity(self, spark):
        text = "nothing to see here"
        out = redact_entity_mentions(
            _pages(spark, [("d", text)]), labels=LABELS, gazetteer=GAZ,
            scoring="gazetteer", lang_col=None,
        ).first()
        assert out["redacted_text"] == text
        assert out["n_ner_redactions"] == 0

    def test_distributed_equals_kernel_splice(self, spark):
        """Operator output equals a driver-side reimplementation of the
        splice over the same pipeline — partitioning never changes the
        redaction (the corpus gate relies on this)."""
        pdf = pd.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text"],
        ).head(80)
        rows = [(str(i), t) for i, t in zip(pdf["doc_id"], pdf["text"])]
        gaz = {"customer": "person", "spark": "organization"}
        got = {
            r["url"]: (r["redacted_text"], r["n_ner_redactions"])
            for r in redact_entity_mentions(
                _pages(spark, rows).repartition(7),
                labels=sorted(set(gaz.values())), gazetteer=gaz,
                scoring="gazetteer", lang_col=None,
            ).collect()
        }
        from gliner_spark.model.pipeline import GLiNERPipeline, PipelineConfig

        pipe = GLiNERPipeline(
            sorted(set(gaz.values())), [],
            PipelineConfig(threshold=0.5, scoring="gazetteer"),
            gazetteer=gaz,
        )
        changed = 0
        for url, text in rows:
            parts, pos = [], 0
            ents = pipe.predict_entities(text, "en")
            for e in ents:
                parts.append(text[pos : e["start"]])
                parts.append(f"<{e['label'].upper()}>")
                pos = e["end"]
            parts.append(text[pos:])
            assert got[url] == ("".join(parts), len(ents)), url
            changed += bool(ents)
        assert changed > 10  # non-vacuous: the corpus really has mentions


class TestRound5ReviewFixes:
    def test_nested_span_configs_are_rejected(self, spark):
        import pytest

        df = _pages(spark, [("d", "acme corp ships")])
        with pytest.raises(ValueError, match="disjoint"):
            redact_entity_mentions(
                df, labels=LABELS, gazetteer=GAZ, scoring="gazetteer",
                lang_col=None, flat_ner=False,
            )
        with pytest.raises(ValueError, match="disjoint"):
            redact_entity_mentions(
                df, labels=LABELS, gazetteer=GAZ, scoring="gazetteer",
                lang_col=None, multi_label=True,
            )
