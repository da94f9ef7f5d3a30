"""Checkpointed resumability: per-chunk lineage manifest + idempotent writes.

The north rule demands restart-safe runs with per-partition lineage and
no duplicated triples. Without an Iceberg catalog in this environment,
the same guarantee is built from parquet primitives:

* the corpus is split into deterministic chunks by
  ``pmod(hash(url), n_chunks)`` — stable across reruns;
* each chunk's outputs land under ``<out>/chunk=<k>/`` via dynamic
  partition overwrite (rerunning a chunk REPLACES its directory, never
  appends — idempotent);
* a manifest row ``(run_id, chunk, n_docs, n_rows, wall_ms, status,
  finished_ts)`` is appended only AFTER the chunk's data commit;
* resume = skip chunks whose manifest row exists. A kill between data
  write and manifest append reruns that chunk and overwrites it.

On Iceberg this maps 1:1 to MERGE INTO + a lineage table in one
transaction; the chunk loop and manifest schema stay identical.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, List, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST_SCHEMA = (
    "run_id string, chunk int, n_docs long, n_rows long, "
    "wall_ms long, status string, finished_ts timestamp"
)


@dataclass
class ChunkResult:
    chunk: int
    n_docs: int
    n_rows: int
    wall_ms: int
    skipped: bool


class RunManifest:
    """Chunked, resumable, idempotent pipeline runner."""

    def __init__(self, spark: SparkSession, manifest_path: str, run_id: str):
        self.spark = spark
        self.manifest_path = manifest_path
        self.run_id = run_id

    def completed_chunks(self) -> set:
        try:
            rows = (
                self.spark.read.schema(MANIFEST_SCHEMA)
                .parquet(self.manifest_path)
                .where(F.col("status") == "ok")
                .select("chunk")
                .collect()
            )
            return {r.chunk for r in rows}
        except Exception:
            return set()  # no manifest yet

    def _append_manifest(self, chunk: int, n_docs: int, n_rows: int, wall_ms: int):
        row = [(self.run_id, chunk, n_docs, n_rows, wall_ms, "ok")]
        (
            self.spark.createDataFrame(
                row, "run_id string, chunk int, n_docs long, n_rows long, wall_ms long, status string"
            )
            .withColumn("finished_ts", F.current_timestamp())
            .write.mode("append")
            .parquet(self.manifest_path)
        )

    def run(
        self,
        source: DataFrame,
        transform: Callable[[DataFrame], DataFrame],
        out_path: str,
        key_col: str = "url",
        n_chunks: int = 8,
        count_col: Optional[str] = None,
        extra_partition_cols: tuple = (),
    ) -> List[ChunkResult]:
        """Process ``source`` chunk-by-chunk with resume.

        ``transform`` maps a chunk DataFrame to an output DataFrame.
        Outputs are written parquet-partitioned by ``chunk`` (plus any
        ``extra_partition_cols`` — e.g. ``("pred",)`` materializes the
        north rule's predicate-partitioned graph table, with predicate
        scans pruning to their directories); the overwrite mode is
        per-partition (dynamic), so retries replace rather than
        duplicate — a chunk replay owns every (chunk, pred) partition
        it rewrites.
        """
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        done = self.completed_chunks()
        results: List[ChunkResult] = []
        chunked = source.withColumn(
            "__chunk", F.pmod(F.hash(F.col(key_col)), F.lit(n_chunks))
        )
        part_cols = ["chunk", *extra_partition_cols]
        for k in range(n_chunks):
            if k in done:
                results.append(ChunkResult(k, 0, 0, 0, skipped=True))
                continue
            t0 = time.time()
            chunk_df = chunked.where(F.col("__chunk") == k).drop("__chunk")
            out = transform(chunk_df).withColumn("chunk", F.lit(k))
            out.write.mode("overwrite").partitionBy(*part_cols).parquet(out_path)
            # Read back with an explicit schema: an all-empty chunk writes
            # no part files and schema inference would fail on it.
            n_rows = (
                self.spark.read.schema(out.schema)
                .parquet(out_path)
                .where(F.col("chunk") == k)
                .count()
            )
            n_docs = chunk_df.count()
            wall_ms = int((time.time() - t0) * 1000)
            self._append_manifest(k, n_docs, n_rows, wall_ms)
            results.append(ChunkResult(k, n_docs, n_rows, wall_ms, skipped=False))
        return results
