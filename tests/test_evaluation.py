"""Join-based P/R/F1 metric tests with hand-computed expectations
(semantics from gliner/evaluation/evaluator.py:33-91)."""

import pytest

from gliner_spark.operators.evaluation import (
    docred_string_f1,
    micro_prf,
    per_label_prf,
    relex_micro_prf,
)

ENT_SCHEMA = "url string, start int, end int, label string"


@pytest.fixture()
def frames(spark):
    pred = spark.createDataFrame(
        [
            ("u1", 0, 4, "person"),       # TP
            ("u1", 10, 14, "org"),        # TP
            ("u1", 20, 24, "person"),     # FP (wrong span)
            ("u2", 0, 4, "person"),       # FP (wrong label)
            ("u1", 0, 4, "person"),       # duplicate → set semantics
        ],
        ENT_SCHEMA,
    )
    gold = spark.createDataFrame(
        [
            ("u1", 0, 4, "person"),
            ("u1", 10, 14, "org"),
            ("u2", 0, 4, "org"),
            ("u2", 6, 9, "location"),
        ],
        ENT_SCHEMA,
    )
    return pred, gold


class TestMicroPRF:
    def test_counts_and_scores(self, spark, frames):
        pred, gold = frames
        row = micro_prf(pred, gold).collect()[0]
        # distinct pred = 4, gold = 4, tp = 2
        assert (row.n_pred, row.n_gold, row.tp) == (4, 4, 2)
        assert row.precision == pytest.approx(0.5)
        assert row.recall == pytest.approx(0.5)
        assert row.f1 == pytest.approx(0.5)

    def test_empty_pred_safe_divide(self, spark, frames):
        _, gold = frames
        empty = spark.createDataFrame([], ENT_SCHEMA)
        row = micro_prf(empty, gold).collect()[0]
        assert (row.precision, row.recall, row.f1) == (0.0, 0.0, 0.0)

    def test_perfect_match(self, spark, frames):
        _, gold = frames
        row = micro_prf(gold, gold).collect()[0]
        assert row.f1 == pytest.approx(1.0)


class TestPerLabelPRF:
    def test_per_class_rows(self, spark, frames):
        pred, gold = frames
        rows = {r.label: r for r in per_label_prf(pred, gold).collect()}
        assert rows["person"].tp == 1
        assert rows["person"].n_pred == 3
        assert rows["person"].precision == pytest.approx(1 / 3)
        assert rows["org"].f1 == pytest.approx(2 * 0.5 * 1 / (0.5 + 1))  # p=1/2? no:
        # org: pred has 1 (u1 10-14 org), gold has 2 → P=1, R=0.5
        assert rows["org"].precision == pytest.approx(1.0)
        assert rows["org"].recall == pytest.approx(0.5)
        assert rows["location"].n_pred == 0
        assert rows["location"].f1 == 0.0


TRIPLE_SCHEMA = (
    "url string, subj_start int, subj_end int, subj_text string, "
    "pred string, obj_start int, obj_end int, obj_text string"
)


class TestRelexPRF:
    def test_five_tuple_key(self, spark):
        pred = spark.createDataFrame(
            [
                ("u1", 0, 4, "John", "works_at", 10, 14, "Acme"),
                ("u1", 0, 4, "John", "located_in", 10, 14, "Acme"),  # FP rel
            ],
            TRIPLE_SCHEMA,
        )
        gold = spark.createDataFrame(
            [("u1", 0, 4, "John", "works_at", 10, 14, "Acme")], TRIPLE_SCHEMA
        )
        row = relex_micro_prf(pred, gold).collect()[0]
        assert (row.tp, row.n_pred, row.n_gold) == (1, 2, 1)

    def test_docred_string_f1(self, spark):
        pred = spark.createDataFrame(
            [("u1", 0, 4, "John", "works_at", 10, 14, "Acme")], TRIPLE_SCHEMA
        )
        gold = spark.createDataFrame(
            [("u1", 5, 9, "John", "works_at", 20, 24, "Acme")], TRIPLE_SCHEMA
        )
        # offsets differ but strings match → string-set F1 = 1
        row = docred_string_f1(pred, gold).collect()[0]
        assert row.f1 == pytest.approx(1.0)


class TestMacroWeighted:
    """macro / support-weighted averages (the compute_prf average= knob,
    evaluator.py:34-60)."""

    @pytest.fixture()
    def frames(self, spark):
        pred = spark.createDataFrame(
            [("u1", 0, 1, "a"), ("u1", 2, 3, "a"), ("u2", 0, 1, "b")],
            "url string, start int, end int, label string",
        )
        gold = spark.createDataFrame(
            [("u1", 0, 1, "a"), ("u2", 0, 1, "b"), ("u2", 2, 3, "b"), ("u3", 0, 1, "b")],
            "url string, start int, end int, label string",
        )
        return pred, gold

    def test_macro_is_unweighted_mean(self, frames):
        from gliner_spark.operators.evaluation import macro_prf, per_label_prf

        pred, gold = frames
        per = {r.label: r for r in per_label_prf(pred, gold).collect()}
        m = macro_prf(pred, gold).first()
        assert m.n_labels == 2
        assert m.precision == pytest.approx(
            (per["a"].precision + per["b"].precision) / 2
        )
        assert m.f1 == pytest.approx((per["a"].f1 + per["b"].f1) / 2)

    def test_weighted_uses_gold_support(self, frames):
        from gliner_spark.operators.evaluation import per_label_prf, weighted_prf

        pred, gold = frames
        per = {r.label: r for r in per_label_prf(pred, gold).collect()}
        w = weighted_prf(pred, gold).first()
        tot = per["a"].n_gold + per["b"].n_gold
        want_r = (per["a"].recall * per["a"].n_gold + per["b"].recall * per["b"].n_gold) / tot
        assert w.recall == pytest.approx(want_r)

    def test_micro_vs_macro_diverge_on_skewed_classes(self, frames):
        from gliner_spark.operators.evaluation import macro_prf, micro_prf

        pred, gold = frames
        micro = micro_prf(pred, gold).first()
        macro = macro_prf(pred, gold).first()
        assert micro.recall != pytest.approx(macro.recall)


class TestNullKeySemantics:
    """SQL-join parity: a row with any NULL key field can never be a
    true positive (NULL = NULL is no match in the join form and the
    DuckDB oracle), even when it exists verbatim on both sides."""

    def test_null_key_rows_never_tp(self, spark):
        from gliner_spark.operators.evaluation import match_counts, per_label_prf

        pred = spark.createDataFrame(
            [("u1", 0, 2, None), ("u1", 0, 2, "person")],
            "url string, start int, end int, label string",
        )
        gold = spark.createDataFrame(
            [("u1", 0, 2, None), ("u2", 0, 2, "person")],
            "url string, start int, end int, label string",
        )
        row = match_counts(pred, gold, ["url", "start", "end", "label"]).first()
        assert (row.n_pred, row.n_gold, row.tp) == (2, 2, 0)
        per = {r.label: r for r in per_label_prf(pred, gold).collect()}
        assert per[None].tp == 0
        assert per["person"].n_pred == 1 and per["person"].n_gold == 1
        assert per["person"].tp == 0  # different urls
