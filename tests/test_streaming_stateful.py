"""Custom stateful streaming (applyInPandasWithState): cross-batch
exact dedup with checkpointed state surviving restarts."""

import pytest

from pyspark.sql import functions as F

from gliner_spark.streaming.stateful import streaming_exact_dedup

SCHEMA = "doc_id long, text string"


def _drain(spark, src, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    deduped = streaming_exact_dedup(stream)
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


class TestStreamingExactDedup:
    def test_cross_batch_dedup_survives_restart(self, spark, tmp_path):
        src = str(tmp_path / "in")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        batch1 = [(1, "alpha doc"), (2, "beta doc"), (3, "alpha doc")]
        spark.createDataFrame(batch1, SCHEMA).write.mode("append").parquet(src)
        _drain(spark, src, out, ckpt)
        got1 = spark.read.parquet(out)
        texts1 = sorted(r.text for r in got1.collect())
        assert texts1 == ["alpha doc", "beta doc"]  # within-batch dedup
        # deterministic winner: smallest row wins within the batch
        assert {r.doc_id for r in got1.where(F.col("text") == "alpha doc").collect()} == {1}

        # NEW query run (restart) with the same checkpoint: previously
        # seen content is dropped even though it arrives in a new batch
        batch2 = [(4, "beta doc"), (5, "gamma doc")]
        spark.createDataFrame(batch2, SCHEMA).write.mode("append").parquet(src)
        _drain(spark, src, out, ckpt)
        texts2 = sorted(r.text for r in spark.read.parquet(out).collect())
        assert texts2 == ["alpha doc", "beta doc", "gamma doc"]

    def test_state_counts_duplicates(self, spark, tmp_path):
        # the state keeps a running count; feeding the same content N
        # times emits exactly one row
        src = str(tmp_path / "in2")
        out = str(tmp_path / "out2")
        ckpt = str(tmp_path / "ckpt2")
        rows = [(i, "same text") for i in range(10)]
        spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(src)
        _drain(spark, src, out, ckpt)
        assert spark.read.parquet(out).count() == 1


class TestStreamingKgWithDedup:
    """One query: stateful dedup feeding the extraction transform."""

    def test_dedup_then_extract_across_restarts(self, spark, tmp_path):
        from gliner_spark.operators.extract import extract_entities
        from gliner_spark.streaming.ingest import run_streaming_kg

        src = str(tmp_path / "pages")
        out = str(tmp_path / "ents")
        ckpt = str(tmp_path / "kgckpt")
        gaz = {"acme": "organization"}

        def transform(df):
            return extract_entities(
                df, ["organization"], gazetteer=gaz, scoring="gazetteer",
                min_partitions=0,
            )

        pages_schema = "url string, warc_ts timestamp, html binary, text string, lang string"
        rows1 = [
            ("u1", None, None, "acme builds engines", "en"),
            ("u2", None, None, "acme builds engines", "en"),  # exact dup
            ("u3", None, None, "other text here", "en"),
        ]
        spark.createDataFrame(rows1, pages_schema).write.mode("append").parquet(src)
        run_streaming_kg(spark, src, out, ckpt, transform, schema=pages_schema)
        got1 = spark.read.parquet(out)
        # one surviving 'acme builds engines' page → one entity row
        assert got1.count() == 1 and got1.first().text == "acme"

        # restart with a re-crawl of the same content + one new page
        rows2 = [
            ("u4", None, None, "acme builds engines", "en"),  # seen before
            ("u5", None, None, "acme ships parts", "en"),
        ]
        spark.createDataFrame(rows2, pages_schema).write.mode("append").parquet(src)
        run_streaming_kg(spark, src, out, ckpt, transform, schema=pages_schema)
        got2 = spark.read.parquet(out)
        assert got2.count() == 2  # u4 deduped by state, u5 extracted

    def test_streaming_graph_table_partitioned_by_pred(self, spark, tmp_path):
        """The streaming sink can materialize the predicate-partitioned
        graph table directly: each epoch owns (ingest_batch, pred=*)."""
        import os

        from gliner_spark.operators.extract import extract_triples
        from gliner_spark.streaming.ingest import run_streaming_kg

        src = str(tmp_path / "pages")
        out = str(tmp_path / "graph")
        ckpt = str(tmp_path / "gckpt")
        gaz = {"acme": "organization", "john": "person"}
        pats = [("person", "works_at", "organization")]

        def transform(df):
            return extract_triples(
                df, ["person", "organization"], ["works_at"],
                gazetteer=gaz, patterns=pats, scoring="gazetteer",
                min_partitions=0,
            )

        pages_schema = (
            "url string, warc_ts timestamp, html binary, text string, lang string"
        )
        rows = [("u1", None, None, "john works at acme", "en")]
        spark.createDataFrame(rows, pages_schema).write.mode("append").parquet(src)
        run_streaming_kg(
            spark, src, out, ckpt, transform, schema=pages_schema,
            extra_partition_cols=("pred",),
        )
        batches = [d for d in os.listdir(out) if d.startswith("ingest_batch=")]
        assert batches
        assert any(
            d.startswith("pred=works_at")
            for d in os.listdir(os.path.join(out, batches[0]))
        )
        got = spark.read.parquet(out)
        assert got.count() == 1 and got.first().pred == "works_at"
