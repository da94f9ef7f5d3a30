"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the triples/entities tables are joined repeatedly on the same
keys (url for provenance joins, canonical_id for graph assembly,
band/bucket ids for dedup verify). Writing both sides bucketed by the
join key lets every subsequent equi-join run shuffle-free: Spark reads
matching buckets pairwise and the Exchange disappears from the plan.

Spark's bucketing requires the session catalog (``saveAsTable``); plain
``.parquet(path)`` writes cannot carry bucket metadata. On Iceberg the
same intent is ``PARTITIONED BY (bucket(N, key))``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table."""
    w = df.write.mode(mode).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Equi-join two same-bucketed tables on their bucket key.

    When both sides were written with the same bucket count on ``key``,
    the physical plan contains NO Exchange for either side (verified in
    tests/test_bucketing.py by inspecting the executed plan).
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key)
