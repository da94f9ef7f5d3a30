"""Skew handling: salted repartition + length bucketing.

Common-Crawl-style corpora are 10^4×-skewed by domain/language, and
document lengths are heavy-tailed. Two explicit operators fix both
before the expensive inference stage (SURVEY.md §2.7 X2):

* ``salted_repartition`` — spreads hot keys over N salt buckets so no
  executor owns a whole hot domain/language. Deterministic
  (hash-based), so reruns place rows identically.
* ``length_bucketed`` — sorts rows by token-ish length WITHIN each
  partition so every Arrow batch is length-homogeneous. This is the
  cheap 80% of the reference's sequence-packing win
  (gliner/infer_packing.py:164-208): batches of similar-length docs
  waste no padding/compute on stragglers. No shuffle — it composes
  with the salted repartition's exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_repartition(
    df: DataFrame,
    key: str = "url",
    skew_col: str = "lang",
    num_partitions: int | None = None,
    salt_buckets: int = 64,
) -> DataFrame:
    """Repartition on (skew_col, pmod(hash(key), salt_buckets)).

    One exchange; hot values of ``skew_col`` spread over
    ``salt_buckets`` partitions instead of one.
    """
    salt = F.pmod(F.hash(F.col(key)), F.lit(salt_buckets)).alias("__salt")
    if num_partitions:
        out = df.repartition(num_partitions, F.col(skew_col), salt)
    else:
        out = df.repartition(F.col(skew_col), salt)
    return out


def length_bucketed(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Sort within partitions by text length (no shuffle)."""
    return df.sortWithinPartitions(F.length(F.col(text_col)))
