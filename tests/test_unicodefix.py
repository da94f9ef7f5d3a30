"""Unicode NFC normalization (functions/unicodefix.py): known answers,
byte-keyed-operator motivation, ASCII fast path."""

import unicodedata

from pyspark.sql import functions as F

from gliner_spark.functions.unicodefix import nfc_normalize


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestNfcNormalize:
    def test_composes_combining_marks(self, spark):
        decomposed = "cafe\u0301 ole\u0301 A\u030angstro\u0308m"
        out = _df(spark, [(1, decomposed)]).select(
            nfc_normalize(F.col("text")).alias("t")
        ).first()["t"]
        assert out == "caf\u00e9 ol\u00e9 \u00c5ngstr\u00f6m"
        assert out == unicodedata.normalize("NFC", decomposed)

    def test_ascii_and_nulls_pass_through(self, spark):
        rows = [(1, "plain ascii"), (2, None), (3, "")]
        got = {
            r.doc_id: r.t
            for r in _df(spark, rows)
            .select("doc_id", nfc_normalize(F.col("text")).alias("t"))
            .collect()
        }
        assert got == {1: "plain ascii", 2: None, 3: ""}

    def test_nfc_not_nfkc(self, spark):
        # NFC is lossless: the fi ligature must SURVIVE (NFKC would
        # fold it — information destruction this operator refuses)
        out = _df(spark, [(1, "ﬁsh")]).select(
            nfc_normalize(F.col("text")).alias("t")
        ).first()["t"]
        assert out == "ﬁsh"

    def test_unifies_byte_keys_for_dedup(self, spark):
        """The operator's reason to exist: two encodings of the same
        glyph dedup as ONE document after normalization."""
        from gliner_spark.operators.dedup import exact_duplicates

        rows = [(1, "caf\u00e9 menu"), (2, "cafe\u0301 menu")]  # composed vs decomposed
        raw = exact_duplicates(_df(spark, rows))
        assert raw.where("is_duplicate").count() == 0  # bytes differ
        normed = _df(spark, rows).select(
            "doc_id", nfc_normalize(F.col("text")).alias("text")
        )
        assert exact_duplicates(normed).where("is_duplicate").count() == 1

    def test_length_preserving_change_detected(self, spark):
        """Singleton canonical compositions (U+212B ANGSTROM SIGN →
        U+00C5, U+2126 OHM SIGN → U+03A9) rewrite the string WITHOUT
        changing its codepoint count — a `changed` flag computed from
        lengths silently misses them; the gate compares strings."""
        row = (
            _df(spark, [(1, "1 \u212b and 50 \u2126")])
            .select(
                F.col("text").alias("t"),
                nfc_normalize(F.col("text")).alias("nfc"),
            )
            .select(
                (F.col("nfc") != F.col("t")).alias("changed"),
                (F.length("nfc") != F.length("t")).alias("len_differs"),
            )
            .first()
        )
        assert row.changed and not row.len_differs

    def test_repeated_calls_share_one_udf(self, spark):
        """nfc_normalize memoizes its pandas UDF so multiple call sites
        in one plan are expression-equal (one Arrow pass, not N).
        (Takes the spark fixture: pandas_udf eagerly parses its DDL
        return type through the active SparkContext, so without it the
        test would be suite-order-dependent.)"""
        from gliner_spark.functions.unicodefix import nfc_normalize_udf

        assert nfc_normalize_udf() is nfc_normalize_udf()
