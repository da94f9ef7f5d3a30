"""Cluster entrypoint: training-data preparation over a documents table.

The companion job to ``run_kg_job`` for the other half of the engine —
turning a cleaned-or-raw corpus into a packed training-examples table:

    python scripts/package_pyfiles.py
    spark-submit --master <cluster> \\
        --py-files dist/gliner_spark.zip \\
        scripts/run_corpus_prep.py \\
        --docs <parquet with (doc_id, text, ...)> \\
        --out  <output dir> \\
        [--eval-docs <parquet>]    # decontamination set \\
        [--budget 2048] [--window 1024] [--stride 1024]

Dataflow:

    docs ──[--robots: retroactive robots.txt filter]
         ──[--redact-pii: email/IP/phone scrub]
         ──corpus_keep_list──▶ keep verdicts (quality / exact-dup /
          decontamination, each reason independently recorded)
      └─ filtered survivors
      └─ chunk_documents (over-context docs → word windows)
      └─ pack_sequences  (fixed-budget examples via the two-phase
                          distributed prefix sum)
      └─ <out>/examples   (doc_id, chunk_idx, chunk_text, n_tokens,
                           example_id, offset_in_example)
      └─ <out>/keep_list  (the verdict table — the audit trail for
                           every dropped document; no silent caps)

Prints ONE JSON summary line: docs in/kept, chunks, examples, token
totals, and per-reason drop counts.
"""

from __future__ import annotations

import argparse
import json


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--docs", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--eval-docs", default=None,
                   help="eval/benchmark docs; training docs sharing an "
                   "n-gram with them are dropped as contaminated")
    p.add_argument("--budget", type=int, default=2048,
                   help="tokens per packed training example")
    p.add_argument("--window", type=int, default=1024,
                   help="words per chunk for over-context documents")
    p.add_argument("--stride", type=int, default=None,
                   help="chunk stride (default: window — no overlap)")
    p.add_argument("--shard-size", type=int, default=100_000,
                   help="docs per prefix-sum shard in pack_sequences")
    p.add_argument("--robots", default=None,
                   help="JSON file {host: robots.txt body}: drop pages "
                   "whose url path a host's Disallow rules cover "
                   "(retroactive opt-out; requires a url column)")
    p.add_argument("--redact-pii", action="store_true",
                   help="replace emails/IPs/phone-like runs with class "
                   "tokens before chunking; per-class counts reported")
    return p.parse_args()


def main():
    args = parse_args()
    from pyspark.sql import SparkSession, functions as F

    from gliner_spark.operators.corpus import corpus_keep_list
    from gliner_spark.operators.seqpack import chunk_documents, pack_sequences

    spark = SparkSession.builder.appName("gliner-spark-corpus-prep").getOrCreate()
    docs = spark.read.parquet(args.docs)
    n_docs_raw = docs.count()
    if args.robots:
        from gliner_spark.operators.robots import (
            robots_filter,
            robots_rules_df,
        )

        rules = robots_rules_df(spark, json.load(open(args.robots)))
        docs = robots_filter(docs, rules)
    pii_cols = []
    if args.redact_pii:
        from gliner_spark.functions.pii import pii_columns

        cols = pii_columns(F.col("text"))
        docs = docs.select(
            *[c for c in docs.columns if c != "text"],
            cols["redacted_text"].alias("text"),
            cols["n_emails"].alias("_n_emails"),
            cols["n_ips"].alias("_n_ips"),
            cols["n_phones"].alias("_n_phones"),
        )
        pii_cols = ["_n_emails", "_n_ips", "_n_phones"]
    # persist ONCE after the optional stages: every downstream action
    # (the robots-drop count, the pii totals, the keep-list write, the
    # survivor join, the chunk/pack write) would otherwise re-run the
    # robots join + three regex replaces over the whole corpus
    docs = docs.persist()
    n_docs_staged = docs.count()  # materializes the cache
    robots_dropped = n_docs_raw - n_docs_staged  # pii drops no rows
    pii_counts_summary = {}
    if args.redact_pii:
        agg = docs.agg(
            F.sum("_n_emails").alias("e"),
            F.sum("_n_ips").alias("i"),
            F.sum("_n_phones").alias("p"),
        ).first()
        pii_counts_summary = {
            "emails": int(agg.e or 0),
            "ips": int(agg.i or 0),
            "phones": int(agg.p or 0),
        }
        docs = docs.drop(*pii_cols)
    eval_df = spark.read.parquet(args.eval_docs) if args.eval_docs else None

    keep = corpus_keep_list(docs, eval_df=eval_df)
    keep.write.mode("overwrite").parquet(f"{args.out}/keep_list")
    keep = spark.read.parquet(f"{args.out}/keep_list")  # committed verdicts

    survivors = docs.join(
        keep.where("keep").select("doc_id"), "doc_id", "left_semi"
    )
    chunks = chunk_documents(
        survivors, window=args.window, stride=args.stride
    )
    # stable numeric chunk uid preserving (doc, position) order — the
    # packing order is therefore document order, then chunk order.
    # Bounds, enforced not assumed: chunk_idx must stay < the 1e6 uid
    # spacing (raise_error inside the uid expression fails the job
    # loudly instead of colliding into the next doc's uid range — a
    # tiny --stride on a giant doc could exceed it) and doc_id (cast
    # to BIGINT first: an int32 input column would silently wrap the
    # multiply) must stay < ~9.2e12 — re-key larger ids upstream.
    _SPACING = 1_000_000
    _MAX_DOC_ID = 9_223_372_036_854 - 1  # BIGINT max // spacing, head-roomed
    safe_idx = F.when(
        F.col("chunk_idx") < F.lit(_SPACING), F.col("chunk_idx")
    ).otherwise(
        F.raise_error(
            F.lit("chunk_idx exceeds the uid spacing: document longer "
                  "than stride*1e6 words — raise the spacing")
        ).cast("int")
    )
    # the doc_id bound gets the SAME loud treatment (ADVICE r4): under
    # default non-ANSI mode a doc_id past ~9.2e12 would silently wrap
    # the BIGINT multiply, colliding uids and corrupting packing order
    safe_doc = F.when(
        F.col("doc_id").cast("long") <= F.lit(_MAX_DOC_ID), F.col("doc_id")
    ).otherwise(
        F.raise_error(
            F.lit("doc_id exceeds the chunk_uid headroom (~9.2e12): "
                  "re-key document ids upstream before chunking")
        ).cast("long")
    )
    chunked = chunks.select(
        (safe_doc.cast("long") * F.lit(_SPACING).cast("long")
         + safe_idx).alias("chunk_uid"),
        "doc_id", "chunk_idx", "chunk_text",
        F.col("n_words_chunk").cast("long").alias("n_tokens"),
    )
    packed = pack_sequences(
        chunked, budget=args.budget, id_col="chunk_uid",
        tokens_col="n_tokens",
        # uids jump by _SPACING per doc; scale the shard width so
        # --shard-size keeps its documented "docs per shard" meaning
        # (unscaled, every doc would land in its own shard and the
        # offsets table would grow with n_docs, not n_docs/shard)
        shard_size=args.shard_size * _SPACING,
    )
    packed.write.mode("overwrite").parquet(f"{args.out}/examples")

    out = spark.read.parquet(f"{args.out}/examples")
    agg = out.agg(
        F.count(F.lit(1)).alias("chunks"),
        F.countDistinct("example_id").alias("examples"),
        F.sum("n_tokens").alias("tokens"),
    ).first()
    reasons = {
        r.reason: r.n
        for r in keep.select(F.explode("reasons").alias("reason"))
        .groupBy("reason").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    summary = {
        "docs_in": n_docs_raw,
        "robots_dropped": robots_dropped,
        "pii_redacted": pii_counts_summary,
        "docs_kept": keep.where("keep").count(),
        "dropped_by_reason": reasons,
        "chunks": agg.chunks,
        "examples": agg.examples,
        "tokens": agg.tokens,
        "budget": args.budget,
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
