"""Graph-table sink: partitioned triple tables with per-partition lineage.

The north rule's output contract: extracted (subj, pred, obj) triples
land in partitioned Iceberg graph tables, with per-partition lineage
rows and idempotent (checkpoint-resumable) writes. This module is that
sink:

* ``write_graph_table`` — partition by ``pred`` (the natural query key
  of a KG edge table: "give me all works_at edges" prunes to one
  directory), dynamic partition overwrite (a rerun REPLACES its
  partitions, never appends duplicates — the parquet analog of an
  Iceberg ``REPLACE WHERE``; with an Iceberg catalog the same writer
  commits through ``writeTo(table).overwritePartitions()``), lineage
  appended AFTER the data commit (write-ahead ordering: a kill between
  the two reruns the write, which is idempotent);
* ``read_graph_table`` — scan with predicate pushdown: a ``pred``
  filter prunes to its partition directories (PartitionFilters in the
  physical plan — asserted by tests/test_graph_sink.py);
* per-partition lineage = one row (run_id, pred, n_rows, written_ts)
  per predicate partition per run, the audit trail the rule demands.

Composition with plans/manifest.RunManifest: the manifest chunks the
CORPUS (resume unit = input chunk); this sink partitions the OUTPUT
(query unit = predicate). A resumable full-corpus run uses both —
``RunManifest.run(transform=extract_triples, ...)`` writing through
``write_graph_table`` per chunk with ``extra_partition_cols=("chunk",)``
so replayed chunks replace exactly their own (chunk, pred) partitions.

Scale notes (100 TB): the write's only movement is the shuffle implied
by ``.repartition(partition_cols)`` when requested (off by default —
the extractor's output partitioning is already fine and AQE coalesces
small files); lineage counts ride ``groupBy(pred).count()`` which
map-side combines to |preds| rows. Predicate skew (one dominant
relation) affects file sizes, not correctness — pass
``files_per_partition`` to spread a hot predicate over several files.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

LINEAGE_SCHEMA = (
    "run_id string, pred string, n_rows long, wall_ms long, written_ts timestamp"
)

TRIPLE_COLS = (
    "url",
    "subj_start", "subj_end", "subj_text", "subj_label",
    "pred",
    "obj_start", "obj_end", "obj_text", "obj_label",
    "score",
)


def write_graph_table(
    triples: DataFrame,
    path: str,
    run_id: str,
    partition_col: str = "pred",
    extra_partition_cols: Sequence[str] = (),
    lineage_path: Optional[str] = None,
    distinct: bool = True,
    files_per_partition: Optional[int] = None,
) -> DataFrame:
    """Write a triples DataFrame as a partitioned graph table.

    Returns the lineage DataFrame that was appended (one row per
    ``partition_col`` value). Idempotent per partition: rerunning the
    same input replaces the partitions it owns (dynamic overwrite) and
    appends a fresh lineage row — consumers take the latest
    ``written_ts`` per (run_id, pred) as authoritative.

    ``distinct=True`` collapses exact duplicate triples (same doc, same
    offsets, same labels) before the write — extraction replays and
    multi-source unions stay idempotent at the ROW level too.
    ``files_per_partition`` repartitions to bound file count per
    partition value (hot-predicate file spread).
    """
    spark = triples.sparkSession
    t0 = time.time()
    part_cols = [partition_col, *extra_partition_cols]
    out = triples
    if distinct:
        out = out.dropDuplicates()
    if files_per_partition:
        out = out.repartition(
            files_per_partition * 4, *[F.col(c) for c in part_cols]
        )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    out.write.mode("overwrite").partitionBy(*part_cols).parquet(path)

    # lineage AFTER the data commit (write-ahead ordering); counts come
    # from a read-back of the committed files, so the audit row records
    # what is actually on disk, not what the plan intended.
    committed = spark.read.schema(out.schema).parquet(path)
    # count ONLY the partitions this run owns (values present in the
    # input), not sibling partitions left behind by earlier runs that
    # wrote a different predicate set to the same path — attributing
    # their counts to this run_id would corrupt the audit trail. The
    # owned set is tiny (≤ partitions written this run) — collect it
    # and pre-filter with per-column isin so the read-back SCAN prunes
    # to the owned directories (a bare semi-join would read every
    # partition first); the semi-join then refines to exact combos.
    # Applied unconditionally: the default pred-only case needs the
    # isolation just as much as the multi-column case.
    own_rows = out.select(*part_cols).distinct().collect()
    for i, c in enumerate(part_cols):
        vals = {r[i] for r in own_rows}
        # NULL-aware: a NULL partition value lands in the hive default
        # partition and reads back as NULL; isin() never matches NULL,
        # so without the explicit isNull branch those committed rows
        # would be excluded and the audit row would under-count.
        cond = F.col(c).isin([v for v in vals if v is not None])
        if None in vals:
            cond = cond | F.col(c).isNull()
        committed = committed.where(cond)
    if len(part_cols) > 1:
        own = spark.createDataFrame(own_rows, out.select(*part_cols).schema)
        cond = None
        for c in part_cols:
            eq = committed[c].eqNullSafe(own[c])
            cond = eq if cond is None else (cond & eq)
        committed = committed.join(F.broadcast(own), cond, "left_semi")
    wall_ms = int((time.time() - t0) * 1000)
    lineage = (
        committed.groupBy(partition_col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.lit(run_id).alias("run_id"),
            F.col(partition_col).cast("string").alias("pred"),
            F.col("n_rows").cast("long"),
            F.lit(wall_ms).cast("long").alias("wall_ms"),
            F.current_timestamp().alias("written_ts"),
        )
    )
    target = lineage_path or f"{path}_lineage"
    lineage.write.mode("append").parquet(target)
    return spark.read.schema(LINEAGE_SCHEMA).parquet(target).where(
        F.col("run_id") == run_id
    )


def read_graph_table(
    spark: SparkSession, path: str, pred: Optional[str] = None
) -> DataFrame:
    """Read the graph table; a ``pred`` filter prunes partitions (the
    scan touches only that predicate's directories)."""
    df = spark.read.parquet(path)
    if pred is not None:
        df = df.where(F.col("pred") == pred)
    return df


def read_lineage(spark: SparkSession, path: str) -> DataFrame:
    """Lineage rows for a graph table written by write_graph_table."""
    return spark.read.schema(LINEAGE_SCHEMA).parquet(f"{path}_lineage")
