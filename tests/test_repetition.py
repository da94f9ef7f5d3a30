"""Repetition quality metrics: hand-computed answers, degenerate
inputs, agreement with an independent Python oracle, zero-shuffle
plan shape."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from gliner_spark.functions.repetition import (
    repetition_columns,
    with_repetition_metrics,
)

K = 8


def py_metrics(text, k=K):
    """Independent reference implementation (dict/Counter, no arrays)."""
    words = text.split()
    lines = [" ".join(words[i * k : (i + 1) * k]) for i in range((len(words) + k - 1) // k)]
    lc = Counter(lines)
    nl, nd = len(lines), len(lc)
    dupch = sum(len(l) for l in lines if lc[l] > 1)
    lnch = sum(len(l) for l in lines)
    bg = Counter(
        f"{words[i]} {words[i + 1]}" for i in range(len(words) - 1)
    )
    return {
        "n_words": len(words),
        "n_lines": nl,
        "dup_line_frac": (nl - nd) / nl if nl else 0.0,
        "dup_line_char_frac": dupch / lnch if lnch else 0.0,
        "top_bigram_frac": max(bg.values()) / (len(words) - 1)
        if len(words) >= 2
        else 0.0,
    }


def run(spark, texts, k=K):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")
    cols = repetition_columns(F.col("text"), line_words=k)
    rows = (
        df.select("id", *[c.alias(n) for n, c in cols.items()])
        .orderBy("id")
        .collect()
    )
    return [r.asDict() for r in rows]


class TestRepetitionMetrics:
    def test_duplicate_lines_hand_computed(self, spark):
        # two identical 8-word lines + a 2-word tail
        text = "a b c d e f g h a b c d e f g h x y"
        (got,) = run(spark, [text])
        assert got["n_words"] == 18
        assert got["n_lines"] == 3
        assert got["dup_line_frac"] == pytest.approx(1 / 3)
        assert got["dup_line_char_frac"] == pytest.approx(30 / 33)
        # 'a b' (and 'b c' …) occur twice among 17 bigrams
        assert got["top_bigram_frac"] == pytest.approx(2 / 17)

    def test_keyword_stuffing(self, spark):
        (got,) = run(spark, ["spam spam spam spam spam"])
        assert got["top_bigram_frac"] == 1.0
        assert got["dup_line_frac"] == 0.0  # single line — nothing to repeat

    def test_degenerate_inputs(self, spark):
        for got in run(spark, ["", "   ", "one"]):
            assert got["n_lines"] == got["n_words"] in (0, 1)
            assert got["dup_line_frac"] == 0.0
            assert got["dup_line_char_frac"] == 0.0
            assert got["top_bigram_frac"] == 0.0

    def test_multi_space_equals_single_space(self, spark):
        a, b = run(spark, ["x  y   z", "x y z"])
        a.pop("id"), b.pop("id")
        assert a == b

    def test_agrees_with_python_oracle(self, spark):
        import random

        rng = random.Random(41)
        vocab = ["red", "blue", "green", "ox", "k"]
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 60)))
            for _ in range(40)
        ]
        got = run(spark, texts)
        for r, text in zip(got, texts):
            want = py_metrics(text)
            for key, val in want.items():
                assert r[key] == pytest.approx(val), (key, text)

    def test_zero_shuffle_plan(self, spark):
        df = spark.createDataFrame([("a b",)], "text string")
        cols = repetition_columns(F.col("text"))
        plan = (
            df.select(*[c.alias(n) for n, c in cols.items()])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan

    def test_staged_fast_path_identical_and_shuffle_free(self, spark):
        """with_repetition_metrics (the fast path: arrays materialized
        once per row) must return exactly what the raw expressions do,
        keep the caller's columns, and still plan zero exchanges —
        and the optimizer must NOT collapse the staging projections
        back into one (which would duplicate the tokenization subtree
        into every metric expression again, the 25x slowdown this
        exists to avoid)."""
        import random

        rng = random.Random(7)
        vocab = ["red", "blue", "green", "ox", "k"]
        texts = [""] + [
            " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 60)))
            for _ in range(30)
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "id int, text string"
        )
        fast = with_repetition_metrics(df, "text")
        assert fast.columns[:2] == ["id", "text"]
        got = [r.asDict() for r in fast.drop("text").orderBy("id").collect()]
        want = run(spark, texts)
        assert got == want
        plan = fast._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        optimized = (
            fast._jdf.queryExecution().optimizedPlan().toString()
        )
        # the staged word-array alias survives optimization
        assert "__rep_words" in optimized
