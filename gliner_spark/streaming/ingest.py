"""Structured Streaming ingestion for continuous KG construction.

The reference is batch-only (SURVEY.md §2.9); the north rule's
"checkpointed resumability" is primarily served by the batch manifest
(plans/manifest.py). This module adds the true streaming surface for
continuously-arriving crawls:

  readStream(pages dir, file source) → foreachBatch(
      extraction transform → idempotent per-batch partition write)
  with checkpointLocation

Exactly-once story: the file source's checkpoint records which input
files each epoch consumed; the sink writes every micro-batch under its
own ``ingest_batch=<id>`` partition with dynamic partition overwrite,
so a replayed epoch REPLACES its partition instead of appending
duplicates — the parquet analog of an idempotent Iceberg MERGE keyed on
(url, span). Extraction itself is stateless per row, so no watermarks
or state stores are needed; late data is just another file.

``trigger(availableNow=True)`` drains everything present then stops —
the standard incremental-batch pattern (run it from cron/Airflow and
each invocation processes exactly the new files).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.pages import PAGES_SCHEMA


def stream_pages(
    spark: SparkSession,
    input_path: str,
    schema: str = PAGES_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a growing pages directory.

    ``maxFilesPerTrigger`` bounds micro-batch size (memory control at
    scale); the schema must be supplied (streaming sources don't infer).
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_path)


def run_streaming_extraction(
    spark: SparkSession,
    input_path: str,
    out_path: str,
    checkpoint: str,
    transform: Callable[[DataFrame], DataFrame],
    schema: str = PAGES_SCHEMA,
    available_now: bool = True,
    timeout_sec: int | None = None,
):
    """Drain the pages stream through ``transform`` into an idempotent
    partitioned sink. Returns after the query stops (availableNow) or
    after ``timeout_sec``."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    stream = stream_pages(spark, input_path, schema)

    def handle(batch_df: DataFrame, batch_id: int):
        out = transform(batch_df).withColumn("ingest_batch", F.lit(batch_id))
        # dynamic overwrite: an epoch replay replaces its own partition
        out.write.mode("overwrite").partitionBy("ingest_batch").parquet(out_path)

    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if timeout_sec:
        q.awaitTermination(timeout_sec)
        q.stop()
    else:
        q.awaitTermination()
    return q


def run_streaming_kg(
    spark: SparkSession,
    input_path: str,
    out_path: str,
    checkpoint: str,
    transform: Callable[[DataFrame], DataFrame],
    schema: str = PAGES_SCHEMA,
    dedup_text_col: str = "text",
    timeout_sec: int | None = None,
    extra_partition_cols: tuple = (),
):
    """Continuous KG construction with cross-batch dedup in ONE query:

      readStream(pages) → applyInPandasWithState exact dedup (a page
      whose content was ever seen — in this run or before the last
      restart — is dropped; state in the checkpoint) → foreachBatch(
      extraction transform → idempotent per-epoch partition write).

    The stateful dedup guards an append-only triples sink against crawl
    re-fetches without any batch-side join, and its state is one row
    per distinct content hash. ``trigger(availableNow=True)`` drains
    then stops — cron-style incremental runs.

    ``extra_partition_cols=("pred",)`` materializes the streaming
    output as the predicate-partitioned graph table (the batch sink's
    layout, sinks/graph.py): each epoch owns its
    (ingest_batch, pred=*) partitions, replays replace them, and
    predicate scans prune across every epoch.
    """
    from .stateful import streaming_exact_dedup

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    stream = stream_pages(spark, input_path, schema)
    deduped = streaming_exact_dedup(stream, text_col=dedup_text_col).drop(
        "content_hash"
    )
    part_cols = ["ingest_batch", *extra_partition_cols]

    def handle(batch_df: DataFrame, batch_id: int):
        out = transform(batch_df).withColumn("ingest_batch", F.lit(batch_id))
        out.write.mode("overwrite").partitionBy(*part_cols).parquet(out_path)

    q = (
        deduped.writeStream.foreachBatch(handle)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec or 300)
    return q
