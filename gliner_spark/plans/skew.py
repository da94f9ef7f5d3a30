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


def skew_profile(
    df: DataFrame,
    keys: tuple[str, ...] = ("source", "lang"),
    target_rows: int = 100_000,
) -> DataFrame:
    """Measure per-key skew and derive a per-key salt factor.

    ``salted_repartition`` above uses one GLOBAL salt_buckets; at
    Common-Crawl skew (a 10^4× hot domain next to 10^5 one-page
    domains) that either under-splits the hot key or shatters the cold
    ones into empty partitions. This profiler computes, per key group:

      n_rows       exact row count
      share_ppm    n_rows * 1e6 DIV total (integer parts-per-million)
      salt_buckets ceil(n_rows / target_rows), i.e. the number of salt
                   partitions needed so no task owns more than
                   ~target_rows rows of one key

    Cost: one map-side-combined groupBy of (keys) — the shuffle moves
    one row per distinct key per task, never the corpus. The window
    computing ``total`` runs over the AGGREGATED frame (|distinct
    keys| rows), so its single-partition sort is bounded by key
    cardinality, not data size; for >10^7 distinct keys swap it for a
    scalar agg + broadcast cross-join.

    All outputs are integer arithmetic (floor division), so a SQL
    oracle reproduces them exactly.
    """
    if target_rows < 1:
        raise ValueError(f"target_rows must be >= 1, got {target_rows}")
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    return counts.select(
        *keys,
        "n_rows",
        F.expr("(n_rows * 1000000L) div sum(n_rows) over ()").alias("share_ppm"),
        F.expr(f"(n_rows + {target_rows - 1}L) div {target_rows}L").alias(
            "salt_buckets"
        ),
    )


def adaptive_salted_repartition(
    df: DataFrame,
    keys: tuple[str, ...] = ("source", "lang"),
    id_col: str = "url",
    target_rows: int = 100_000,
    num_partitions: int | None = None,
) -> DataFrame:
    """Repartition with a PER-KEY salt factor from ``skew_profile``.

    The (small) profile is broadcast-joined onto the corpus — no extra
    corpus shuffle beyond the repartition itself — and each row gets
    ``__salt = pmod(hash(id), salt_buckets(key))``: hot keys spread
    over exactly as many partitions as their volume needs, cold keys
    stay whole (salt_buckets = 1 → __salt = 0, preserving downstream
    per-key locality).
    """
    profile = skew_profile(df, keys=keys, target_rows=target_rows).select(
        *[F.col(k).alias(f"__p_{k}") for k in keys], "salt_buckets"
    )
    # null-safe equality: skew_profile's groupBy emits a row for the
    # NULL key group, and a plain equi-join (NULL != NULL) would
    # silently DROP every NULL-keyed corpus row — e.g. docs with no
    # lang before language-ID runs. <=> is still hash-joinable, so
    # the broadcast join shape is unchanged.
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"__p_{k}"))
        cond = c if cond is None else (cond & c)
    out = df.join(F.broadcast(profile), cond).drop(
        *[f"__p_{k}" for k in keys]
    )
    salt = F.pmod(F.hash(F.col(id_col)), F.col("salt_buckets")).alias("__salt")
    key_cols = [F.col(k) for k in keys]
    if num_partitions:
        out = out.repartition(num_partitions, *key_cols, salt)
    else:
        out = out.repartition(*key_cols, salt)
    return out.drop("salt_buckets")
