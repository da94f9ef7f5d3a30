"""Structured Streaming ingestion: incremental processing + replay
idempotence through the checkpoint."""

import pytest

from gliner_spark.operators.extract import extract_entities
from gliner_spark.sources.pages import pages_df
from gliner_spark.streaming.ingest import run_streaming_extraction

LABELS = ["person", "organization"]
GAZ = {"acme corporation": "organization", "john smith": "person"}


def transform(df):
    return extract_entities(
        df, LABELS, gazetteer=GAZ, scoring="gazetteer", min_partitions=0
    )


class TestStreamingIngest:
    def test_incremental_drain_and_resume(self, spark, tmp_path):
        src = str(tmp_path / "pages_in")
        out = str(tmp_path / "ents_out")
        ckpt = str(tmp_path / "ckpt")

        first = pages_df(spark, 60)
        first.write.mode("append").parquet(src)
        run_streaming_extraction(spark, src, out, ckpt, transform)

        got1 = spark.read.parquet(out)
        expected1 = transform(first).count()
        assert got1.count() == expected1

        # new files arrive; the SAME checkpoint processes only them
        second = pages_df(spark, 40, seed=7)
        second.write.mode("append").parquet(src)
        run_streaming_extraction(spark, src, out, ckpt, transform)

        got2 = spark.read.parquet(out)
        expected2 = transform(second).count()
        assert got2.count() == expected1 + expected2
        # batches land in distinct idempotent partitions
        batches = {r.ingest_batch for r in got2.select("ingest_batch").distinct().collect()}
        assert len(batches) >= 2

        # re-running with nothing new is a no-op (no duplicates)
        run_streaming_extraction(spark, src, out, ckpt, transform)
        assert spark.read.parquet(out).count() == expected1 + expected2
