"""Benchmark harness: runs every implemented query at SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[SPARK_GRAFT_CPUS] and prints ONE
JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Extra keys: docs_per_sec (flagship KG-extraction throughput, the north
rule's unit), n_docs, cpus.

Each query is forced with a noop write (computes every output column —
count() would let Catalyst prune the interesting work). Scaling-
efficiency evidence (same job at two parallelism levels) lives in
scripts/scaling_bench.py → BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time


def build_session(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.appName("gliner-spark-bench")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(2 * cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        # local mode: executors share the driver JVM, so this heap is
        # divided across all concurrent tasks — 8g across 32 tasks GC-
        # thrashed the shuffle-heavy queries (2-5x slowdowns mid-bench)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )


def force(df) -> None:
    """Materialize every column exactly once (count() would let
    Catalyst prune the interesting work; a second action would
    recompute the whole plan)."""
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry

    spark = build_session(cpus)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    # JIT/codegen warmup: the first execution of each plan shape pays
    # ~3x (whole-stage codegen compilation, JIT tiers); warm the heavy
    # shapes once so the recorded numbers are steady-state.
    qs = entry.queries()
    for warm in ("dedup_minhash_lsh", "kg_triples_zeroshot", "ann_topk_cosine"):
        force(qs[warm](spark, sf_dir))

    timings: dict[str, float] = {}
    flagship = "kg_triples_zeroshot"
    total0 = time.perf_counter()
    for name, fn in qs.items():
        t0 = time.perf_counter()
        force(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
    total = round(time.perf_counter() - total0, 3)

    docs_per_sec = round(n_docs / timings[flagship], 2) if timings.get(flagship) else None
    print(
        json.dumps(
            {
                "metric": "all_queries_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_docs": n_docs,
                "cpus": cpus,
                "flagship": flagship,
                "docs_per_sec": docs_per_sec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
