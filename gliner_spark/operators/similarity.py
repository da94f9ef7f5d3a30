"""Similarity search over embedding columns.

Two routes with identical output contracts (query_id, neighbor_id,
rank):

* ``brute_force_topk`` — exact cosine top-k; the correctness baseline.
  The query side is explicitly ``broadcast()`` (queries are the small
  side by construction), so the corpus never shuffles: scan → broadcast
  hash join → per-query window top-k.
* ``bucketed_topk`` — LSH/IVF-style scale path: both sides are
  sign-quantized into 2^bits buckets (functions.vectors.sign_bucket) and
  the join runs per-bucket, pruning the candidate set by ~2^bits.
  Approximate (a true neighbor in another bucket is missed) — the
  standard recall/cost trade; tests measure recall against brute force.

Rank determinism: ORDER BY cosine DESC would tie-break arbitrarily, so
ranking is (cosine DESC, neighbor_id ASC) — total order, reproducible.
The reference's analog is the span×label einsum "join"
(gliner/modeling/base.py:409) repurposed for entity linking
(SURVEY.md §4.2.5); embedding top-k is the table-level version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity, sign_bucket


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(k))
        .select("query_id", "neighbor_id", "rank")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank), self excluded."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine_similarity(F.col("_qv"), F.col("_cv")))
    )
    return _topk(scored, k)


def bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k within the query's sign bucket.

    Candidates = corpus vectors in the same 2^bits sign bucket; top-k by
    exact cosine within the bucket. One equi-join on the bucket id —
    at 100 TB the corpus side is bucketed/partitioned by this key once
    and reused across query batches.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        sign_bucket(F.col(vec_col), bits).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        sign_bucket(F.col(vec_col), bits).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine_similarity(F.col("_qv"), F.col("_cv")))
    )
    return _topk(scored, k)
