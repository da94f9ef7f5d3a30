"""Lossless two-phase per-key top-k — the skew-safe window pattern.

A naive ``row_number() OVER (PARTITION BY key)`` puts a hot key's
ENTIRE row set on one task — the exact skew a Zipfian distribution
(crawl hosts, corpus vocabulary) guarantees. The two-phase form is
lossless: a row in the global top-k of its key is necessarily in the
top-k of its (key, hash-bucket) slice, so phase 1 prunes every slice
to ``k`` rows and the final per-key window sorts ≤ ``k·buckets``
candidates instead of the key's whole row set.

One implementation for every call site (per-host caps, heavy-hitter
vocabularies) — the losslessness argument lives here, once.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def two_phase_topk(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    bucket_on: str | Column,
    buckets: int = 64,
    rank_col: str = "rank",
) -> DataFrame:
    """Input columns plus ``rank_col`` (1-based per key, ≤ ``k``),
    ordered by ``order_cols`` within each ``key_cols`` group.

    ``bucket_on`` picks the value hashed into phase-1 buckets — use a
    column that is unique (or near-unique) per row within a key, so
    hot keys actually spread. Deterministic when ``order_cols`` total-
    orders rows within a key (make the last order column a tiebreak).
    """
    bucket = F.pmod(
        F.hash(F.col(bucket_on) if isinstance(bucket_on, str) else bucket_on),
        F.lit(buckets),
    )
    w1 = Window.partitionBy(*key_cols, "_b").orderBy(*order_cols)
    pruned = (
        df.withColumn("_b", bucket)
        .withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= k)
        .drop("_b", "_r1")
    )
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return pruned.withColumn(rank_col, F.row_number().over(w)).where(
        F.col(rank_col) <= k
    )
