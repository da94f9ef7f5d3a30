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
    vectorized: bool = True,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank), self excluded.

    Default route is the scale pattern: the (small) query matrix is
    broadcast, each corpus partition computes its chunk×queries cosine
    matrix with one BLAS matmul and emits only its LOCAL top-k per
    query (map-side combine), and a final window ranks the
    partitions×k survivors — the shuffle carries O(partitions·|Q|·k)
    rows instead of |corpus|·|Q|. ``vectorized=False`` keeps the
    pure-expression crossJoin baseline the tests compare against.
    """
    if vectorized:
        return _brute_force_topk_vectorized(corpus, queries, k, id_col, vec_col)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine_similarity(F.col("_qv"), F.col("_cv")))
    )
    return _topk(scored, k)


def _brute_force_topk_vectorized(
    corpus: DataFrame, queries: DataFrame, k: int, id_col: str, vec_col: str
) -> DataFrame:
    import numpy as np
    import pandas as pd
    from typing import Iterator

    qpd = queries.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")).toPandas()
    if len(qpd) == 0:
        spark = corpus.sparkSession
        return spark.createDataFrame([], "query_id long, neighbor_id long, rank int")
    q_ids = qpd["_id"].to_numpy()
    q_mat = np.stack(qpd["_v"].to_list()).astype(np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True) + 1e-12
    bc = corpus.sparkSession.sparkContext.broadcast((q_ids, q_mat))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat = bc.value
        for chunk in batches:
            if len(chunk) == 0:
                continue
            cids = chunk["_id"].to_numpy()
            cmat = np.stack(chunk["_v"].to_list()).astype(np.float64)
            cmat /= np.linalg.norm(cmat, axis=1, keepdims=True) + 1e-12
            sims = mat @ cmat.T  # (Q, chunk)
            # self-exclusion, then local top-k per query
            sims[ids[:, None] == cids[None, :]] = -np.inf
            kk = min(k, sims.shape[1])
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows_q = np.repeat(np.arange(len(ids)), kk)
            cols = part.ravel()
            keep = np.isfinite(sims[rows_q, cols])
            yield pd.DataFrame(
                {
                    "query_id": ids[rows_q[keep]],
                    "neighbor_id": cids[cols[keep]],
                    "cos": sims[rows_q[keep], cols[keep]],
                }
            )

    partial = (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .mapInPandas(run, "query_id long, neighbor_id long, cos double")
    )
    return _topk(partial, k)


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    max_iter: int = 20,
    train_size: int = 262_144,
):
    """Fit the IVF coarse quantizer on a SAMPLE of the corpus and
    return the centroid matrix (numpy (n_centroids, dim)).

    An IVF quantizer needs ~256k training vectors regardless of corpus
    size (the FAISS rule of thumb) — fitting KMeans on all 10^12 rows
    is a multi-pass job over the whole table for no recall gain. The
    sample is seeded (reproducible); when the corpus is already small
    the sample is the corpus. Returned centroids can be persisted and
    passed to :func:`ivf_topk` so the expensive fit runs once per
    corpus, not once per query batch.
    """
    import numpy as np

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(array_to_vector(F.col(vec_col)).alias("features"))
    n = corpus.count()
    if n > train_size:
        # slight oversample then exact cap, keeps the fit bounded;
        # sample() is a narrow op — no shuffle, full scan parallelism
        frac = min(1.0, 1.2 * train_size / n)
        train = train.sample(fraction=frac, seed=seed).limit(train_size)
    model = KMeans(
        k=n_centroids, seed=seed, featuresCol="features", maxIter=max_iter
    ).fit(train)
    return np.stack(model.clusterCenters()).astype(np.float64)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 20,
    centroids=None,
    train_size: int = 262_144,
) -> DataFrame:
    """IVF-style ANN: coarse KMeans quantizer + multi-probe search.

    Train ``n_centroids`` KMeans centroids on a bounded SAMPLE of the
    corpus (see :func:`train_ivf_centroids`; pass ``centroids`` to
    reuse a persisted quantizer and skip the fit entirely), assign
    every corpus vector to its cell, and for each query search the
    ``n_probe`` nearest cells exactly. The classic inverted-file trade:
    candidate work drops to ~n_probe/n_centroids of the corpus, recall
    rises with n_probe (tests measure it against brute force). Output
    contract identical to the other routes: (query_id, neighbor_id,
    rank).

    At 100 TB the assignment is a one-off pass persisted alongside the
    embeddings (partitioned/bucketed by cell id), and queries only read
    their probed cells — the same partition-pruning story as a
    bucketed join.
    """
    import numpy as np

    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_centroids=n_centroids, seed=seed, vec_col=vec_col,
            max_iter=max_iter, train_size=train_size,
        )
    centers = np.asarray(centroids, dtype=np.float64)
    sc = corpus.sparkSession.sparkContext
    bc_centers = sc.broadcast(centers)

    def assign_cells(n_cells: int):
        """Column expr: nearest / n-nearest centroid ids via a pandas UDF."""
        import pandas as pandas_mod
        from pyspark.sql.functions import pandas_udf

        def cells(v):
            # One matmul per Arrow batch, no per-row Python loop:
            # ||x-c||² = ||x||² - 2·x·c + ||c||² (the ||x||² term is
            # constant per row and drops out of the argsort).
            C = bc_centers.value
            if len(v) == 0:
                return pandas_mod.Series([], dtype=object)
            X = np.stack(v.to_list()).astype(np.float64)  # (n, dim)
            d = (C**2).sum(axis=1)[None, :] - 2.0 * (X @ C.T)  # (n, n_centroids)
            order = np.argsort(d, axis=1, kind="stable")[:, :n_cells].astype("int32")
            return pandas_mod.Series(list(order.tolist()))

        cells.__annotations__ = {
            "v": pandas_mod.Series, "return": pandas_mod.Series
        }
        return pandas_udf(cells, "array<int>")

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.element_at(assign_cells(1)(F.col(vec_col)), 1).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(assign_cells(n_probe)(F.col(vec_col))).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), on="cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
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
