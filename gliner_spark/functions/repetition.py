"""Repetition quality metrics (Gopher-rule style) — shuffle-free.

Boilerplate-heavy web pages (nav bars, cookie banners, SEO keyword
stuffing) are the classic LLM-training-data failure mode; the Gopher /
RefinedWeb / Dolma pipelines all gate documents on *internal
repetition*: the fraction of duplicate lines, the fraction of
characters inside duplicate lines, and the share of the most frequent
n-gram. This module computes those per document with **zero
shuffles** — every metric is a higher-order-function expression
(``transform`` / ``zip_with`` / ``aggregate``) over the word array, so
a 100 TB pass is one map stage: no explode, no groupBy, no per-doc
key exchange, and the work per document is O(L log L) in its line
count (sorted-adjacency duplicate detection, never the O(L²)
filter-within-filter form).

The synthesized corpus has no newlines, so a "line" is a fixed-width
chunk of ``line_words`` whitespace tokens — the same unit both the
Spark side and the DuckDB oracle derive, keeping the gate hash-exact.
Every fraction is a single per-row int/int → double division
(reproducible across engines; see functions/text.py design rules).
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import Column, functions as F


def _words(text: Column) -> Column:
    """Whitespace tokens with empties dropped (leading/trailing/double
    spaces yield no phantom tokens — mirrors the oracle's
    ``list_filter(string_split_regex(trim(text), '\\s+'), …)``)."""
    return F.filter(
        F.split(F.trim(text), "\\s+"), lambda w: F.length(w) > 0
    )


def _chunk_lines(words: Column, line_words: int) -> Column:
    """K-word chunk "lines" (array<string>); empty array for empty
    docs (guarded — ``sequence(0, -1)`` would count DOWN)."""
    n = F.size(words)
    k = F.lit(line_words)
    n_lines = F.floor((n + k - F.lit(1)) / k).cast("int")
    return F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), n_lines - F.lit(1)),
            lambda i: F.array_join(F.slice(words, i * k + F.lit(1), k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _dup_char_sum(lines: Column) -> Column:
    """Total characters inside lines that occur more than once in this
    document. Sort, then flag every element equal to a sorted
    neighbor — exactly the elements with count > 1."""
    s = F.array_sort(lines)
    n = F.size(s)
    null_str = F.lit(None).cast("string")
    prev = F.concat(
        F.array(null_str), F.slice(s, F.lit(1), F.greatest(n - 1, F.lit(0)))
    )
    nxt = F.concat(
        F.slice(s, F.lit(2), F.greatest(n - 1, F.lit(0))), F.array(null_str)
    )
    eq_prev = F.zip_with(s, prev, lambda a, b: a.eqNullSafe(b))
    eq_next = F.zip_with(s, nxt, lambda a, b: a.eqNullSafe(b))
    flags = F.zip_with(eq_prev, eq_next, lambda a, b: a | b)
    per_line = F.zip_with(
        s, flags, lambda line, f: F.when(f, F.length(line)).otherwise(F.lit(0))
    )
    return F.aggregate(per_line, F.lit(0), lambda acc, x: acc + x)


def _max_bigram_run(words: Column) -> Column:
    """Occurrence count of the document's most frequent word bigram:
    sort the bigram array, then a single ``aggregate`` pass tracks the
    longest equal run (struct accumulator — no explode, no shuffle)."""
    n = F.size(words)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(1)),
            lambda i: F.concat_ws(
                " ", F.element_at(words, i), F.element_at(words, i + F.lit(1))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def merge(acc: Column, x: Column) -> Column:
        # words are non-empty, so bigrams are never "" — the sentinel
        # prev='' cannot collide with a real bigram
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(
        F.array_sort(bigrams), zero, merge, lambda acc: acc["best"]
    )


def _metrics_from_arrays(words: Column, lines: Column) -> Dict[str, Column]:
    n_words = F.size(words)
    n_lines = F.size(lines)
    n_distinct = F.size(F.array_distinct(lines))
    line_chars = F.aggregate(
        F.transform(lines, F.length), F.lit(0), lambda acc, x: acc + x
    )
    dup_chars = _dup_char_sum(lines)
    best_run = _max_bigram_run(words)
    zero = F.lit(0.0)
    return {
        "n_words": n_words,
        "n_lines": n_lines,
        "dup_line_frac": F.when(
            n_lines > 0, (n_lines - n_distinct) / n_lines
        ).otherwise(zero),
        "dup_line_char_frac": F.when(
            line_chars > 0, dup_chars / line_chars
        ).otherwise(zero),
        "top_bigram_frac": F.when(
            n_words >= 2, best_run / (n_words - F.lit(1))
        ).otherwise(zero),
    }


def repetition_columns(
    text: Column, line_words: int = 8
) -> Dict[str, Column]:
    """Per-document repetition metrics as named columns:

    * ``n_words`` — whitespace token count;
    * ``n_lines`` — K-word chunk count (K = ``line_words``);
    * ``dup_line_frac`` — fraction of lines that are duplicates
      (1 − distinct/total — the Gopher duplicate-line rule);
    * ``dup_line_char_frac`` — fraction of line characters inside
      duplicated lines (Gopher's character-weighted variant, the one
      that catches a short page with one giant repeated block);
    * ``top_bigram_frac`` — share of the most frequent word bigram
      among all bigrams (keyword-stuffing detector).

    All pure expressions; the whole computation is one map stage.

    PERFORMANCE HAZARD: because these are raw expressions, every
    metric embeds its own COPY of the word/line-array subtree (and
    ``_dup_char_sum`` alone references the sorted-lines subtree five
    times, each copy nesting the full tokenization chain), and Spark
    evaluates each copy independently per row — no common-
    subexpression elimination across the metric expressions. The
    duplication multiplies through the nesting to dozens of
    re-tokenizations per row (~25x slower, measured at sf0.1). Use
    :func:`with_repetition_metrics` on a DataFrame, which stages the
    arrays through projections so each is computed once per row; keep
    this form only for tiny inputs or single-metric use.
    """
    words = _words(text)
    lines = _chunk_lines(words, line_words)
    return _metrics_from_arrays(words, lines)


def with_repetition_metrics(
    df, text, line_words: int = 8
):
    """``df`` plus the five repetition metric columns (see
    :func:`repetition_columns`), computed the fast way.

    ``text`` is a column name or Column expression. The word and line
    arrays are materialized through two intermediate projections, so
    the many references the metric expressions make to them resolve
    to a cheap attribute instead of each duplicating (and
    re-evaluating, once per row per copy) the whole tokenization
    subtree (Catalyst's CollapseProject keeps multiply-referenced
    non-trivial aliases staged, so the projections survive
    optimization — 25x measured vs the inline-expression form at
    sf0.1). Still zero shuffles: three chained map-stage projections.
    """
    tcol = F.col(text) if isinstance(text, str) else text
    staged = df.withColumn("__rep_words", _words(tcol)).withColumn(
        "__rep_lines", _chunk_lines(F.col("__rep_words"), line_words)
    )
    metrics = _metrics_from_arrays(
        F.col("__rep_words"), F.col("__rep_lines")
    )
    return staged.select(
        *df.columns, *[c.alias(n) for n, c in metrics.items()]
    )
