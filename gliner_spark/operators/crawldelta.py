"""Re-crawl delta: what changed between two corpus snapshots.

Production crawls are incremental — each refresh must classify every
url as added / gone / changed / unchanged before the pipeline decides
what to re-extract (re-running NER over an unchanged 100 TB corpus is
the most expensive no-op in the business; the manifest layer resumes
*within* a run, this operator scopes the *next* run). Content equality
is md5-of-text, the same engine-portable hash the exact-dedup operator
uses — never a byte compare across the join (hashes are computed
map-side, so only (url, 32-char hex) pairs shuffle, not documents).

Plan shape at 100 TB: two pruned scans → one full-outer shuffle join
on the uniform url key. No skew (urls are unique), no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def crawl_delta(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """(old, new) snapshots → (url, status, old_md5, new_md5) with
    status in {added, gone, changed, unchanged}. NULL text hashes as
    NULL (a page that lost its text counts as changed, not unchanged).
    """
    o = old.select(
        F.col(id_col).alias("_id"),
        F.md5(F.col(text_col)).alias("old_md5"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        F.col(id_col).alias("_id"),
        F.md5(F.col(text_col)).alias("new_md5"),
        F.lit(True).alias("_in_new"),
    )
    joined = o.join(n, "_id", "full_outer")
    # presence is row existence, NOT hash non-null — a page whose text
    # is NULL in one snapshot is changed, not added/gone
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("gone"))
        .when(F.col("old_md5").eqNullSafe(F.col("new_md5")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        F.col("_id").alias(id_col),
        status.alias("status"),
        "old_md5",
        "new_md5",
    )
