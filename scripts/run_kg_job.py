"""Cluster entrypoint: KG construction over a pages table, resumable.

Submit (the north-rule invocation shape — multi-executor, --py-files):

    python scripts/package_pyfiles.py
    spark-submit --master <cluster> \\
        --py-files dist/gliner_spark.zip \\
        scripts/run_kg_job.py \\
        --pages  <path or iceberg table> \\
        --out    <output dir/table> \\
        --manifest <manifest dir> \\
        --labels person,organization,location \\
        --relations works_at,located_in \\
        [--gazetteer gaz.json] [--patterns patterns.json] \\
        [--run-id r1] [--chunks 64] [--salt 64] [--threshold 0.5]

Dataflow (SURVEY.md §7.1): pruned scan → salted repartition +
length-bucket sort (skew plan) → Arrow-batched extract_triples →
chunked idempotent writes with per-chunk lineage rows (resume = rerun
with the same --manifest; completed chunks are skipped).
"""

from __future__ import annotations

import argparse
import json


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--pages", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--manifest", required=True)
    p.add_argument("--labels", required=True)
    p.add_argument("--relations", default="")
    p.add_argument("--gazetteer", default=None)
    p.add_argument("--patterns", default=None)
    p.add_argument("--run-id", default="run-0")
    p.add_argument("--chunks", type=int, default=64)
    p.add_argument("--salt", type=int, default=64)
    p.add_argument("--threshold", type=float, default=0.5)
    return p.parse_args()


def main():
    args = parse_args()
    from pyspark.sql import SparkSession

    from gliner_spark.operators.extract import extract_triples
    from gliner_spark.plans.manifest import RunManifest
    from gliner_spark.plans.skew import length_bucketed, salted_repartition
    from gliner_spark.sources.pages import read_pages

    spark = SparkSession.builder.appName("gliner-spark-kg").getOrCreate()
    labels = [s for s in args.labels.split(",") if s]
    relations = [s for s in args.relations.split(",") if s]
    gazetteer = json.load(open(args.gazetteer)) if args.gazetteer else None
    patterns = (
        [tuple(p) for p in json.load(open(args.patterns))] if args.patterns else None
    )

    pages = read_pages(spark, args.pages)

    def transform(chunk):
        shaped = length_bucketed(
            salted_repartition(chunk, num_partitions=args.salt)
        )
        return extract_triples(
            shaped,
            labels=labels,
            relations=relations,
            threshold=args.threshold,
            gazetteer=gazetteer,
            patterns=patterns,
            min_partitions=0,  # the salted repartition above owns layout
        )

    results = RunManifest(spark, args.manifest, args.run_id).run(
        pages, transform, args.out, n_chunks=args.chunks
    )
    done = sum(1 for r in results if not r.skipped)
    skipped = sum(1 for r in results if r.skipped)
    rows = sum(r.n_rows for r in results)
    print(
        json.dumps(
            {"chunks_run": done, "chunks_skipped": skipped, "new_rows": rows}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
