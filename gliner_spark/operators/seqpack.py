"""Sequence packing: assign documents to fixed-token-budget training
examples — the pretraining-data step after cleaning/dedup (GPT-style
pipelines concatenate documents into ~2k-8k-token examples; T5/Gopher
call it "packing"). Distinct from ``kernel/packing.py``, which packs
the INFERENCE batches inside the extraction UDF; this operator packs
the CORPUS into a training-examples table.

Semantics (deterministic, engine-reproducible):

    order docs by ``id_col`` ascending;
    cum_before(d) = SUM(tokens) over all docs strictly before d;
    example_id(d) = cum_before(d) DIV budget.

i.e. example boundaries fall every ``budget`` tokens of the running
total — a document whose tokens straddle a boundary belongs to the
example where it STARTED (examples may overflow by at most one
document; none underflows except the last). This is the
fixed-boundary variant of greedy packing: unlike greedy-with-reset it
is a pure prefix-sum, so it distributes and replays exactly, and a
DuckDB oracle states it in one window function.

Scale shape — the textbook two-phase distributed prefix sum, because
a naive ``SUM() OVER (ORDER BY id)`` with no partition moves the
WHOLE corpus through one task (Spark even warns "No Partition
Defined for Window operation"):

    1. shard by range: ``shard = id DIV shard_size`` — preserves the
       global order between shards;
    2. per-shard token totals (one tiny map-side-combined groupBy),
       exclusive-prefix-summed into per-shard offsets. The offsets
       table has corpus_size / shard_size rows; the window that
       prefix-sums it runs over THAT aggregate, never the corpus;
    3. broadcast-join the offsets back and compute the in-shard
       running sum with a window partitioned BY SHARD — bounded
       per-task rows at any corpus size.

At 10^12 docs with shard_size 1e6 the offsets table is 10^6 rows —
still aggregate-sized. No reference-repo counterpart (net-new scale
tooling, like functions/text.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    shard_size: int = 100_000,
) -> DataFrame:
    """Assign each document a ``example_id`` under ``budget`` tokens
    per training example (fixed-boundary packing — see module doc).

    Returns the input columns plus:

    * ``cum_before`` — tokens of all docs strictly before this one in
      ``id_col`` order (the exclusive prefix sum);
    * ``example_id`` — ``cum_before DIV budget``;
    * ``offset_in_example`` — ``cum_before % budget`` (where in the
      example this document starts).

    ``id_col`` must be numeric and unique; ``tokens_col`` integer.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if shard_size <= 0:
        raise ValueError(f"shard_size must be positive, got {shard_size}")
    shard = (F.col(id_col) / F.lit(shard_size)).cast("long").alias("_shard")
    docs = df.withColumn("_shard", shard)

    # phase 1-2: per-shard totals → exclusive prefix offsets. The
    # window here orders a SHARD-COUNT-sized aggregate (corpus/1e5
    # rows), not the corpus; broadcast back (aggregate-sized).
    offsets = (
        docs.groupBy("_shard")
        .agg(F.sum(tokens_col).alias("_shard_tokens"))
        .withColumn(
            "_shard_offset",
            F.coalesce(
                F.sum("_shard_tokens").over(
                    Window.orderBy("_shard").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .drop("_shard_tokens")
    )

    # phase 3: in-shard exclusive running sum, partitioned by shard —
    # bounded per-task rows — plus the broadcast shard offset.
    in_shard = Window.partitionBy("_shard").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum_before = F.coalesce(F.sum(tokens_col).over(in_shard), F.lit(0)) + F.col(
        "_shard_offset"
    )
    return (
        docs.join(F.broadcast(offsets), "_shard")
        .withColumn("cum_before", cum_before.cast("long"))
        .withColumn(
            "example_id",
            F.expr(f"cum_before div {int(budget)}"),
        )
        .withColumn(
            "offset_in_example",
            (F.col("cum_before") % F.lit(budget)).cast("long"),
        )
        .drop("_shard", "_shard_offset")
    )


def chunk_documents(
    df: DataFrame,
    window: int,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split long documents into (optionally overlapping) word-window
    chunks — the step before :func:`pack_sequences` when documents
    exceed the training context (and the long-document half of the
    chunk/pack pair: chunk splits, pack concatenates).

    Chunk ``i`` covers words ``[i*stride, i*stride + window)``. A
    document with ``n_words <= window`` yields exactly one chunk
    (itself). ``stride`` defaults to ``window`` (no overlap). With
    ``stride <= window`` every word is covered and the LAST chunk is
    the one that reaches the final word — ``(L - window + stride - 1)
    DIV stride + 1`` chunks (no redundant tail windows past the end).
    With ``stride > window`` chunks SAMPLE the document (gaps between
    windows), emitted while the start lies inside it — ``(L + stride
    - 1) DIV stride`` chunks, so no chunk is ever empty and
    ``n_words_chunk`` is always ≥ 1. All integer math, so the DuckDB
    oracle reproduces counts exactly.

    One map stage + the explode (row multiplication ~L/stride, the
    point of the operator); the token array is staged through a
    projection so the per-chunk slice lambda reads an attribute (see
    functions/repetition.py for why).

    Returns (id, chunk_idx, chunk_text, n_words_chunk).
    """
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    stride = window if stride is None else stride
    if stride <= 0:
        raise ValueError(f"stride must be positive, got {stride}")
    staged = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_ws")
    )
    ws = F.col("_ws")
    n = F.size(ws)
    w, s = F.lit(window), F.lit(stride)
    if stride <= window:
        tail_expr = (
            f"((size(_ws) - {int(window)} + {int(stride)} - 1) "
            f"div {int(stride)}) + 1"
        )
    else:  # gapped sampling: one chunk per start inside the document
        tail_expr = f"(size(_ws) + {int(stride)} - 1) div {int(stride)}"
    n_chunks = (
        F.when(n <= w, F.lit(1)).otherwise(F.expr(tail_expr)).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - F.lit(1)),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.array_join(F.slice(ws, i * s + F.lit(1), w), " ").alias(
                "chunk_text"
            ),
            F.least(w, n - i * s).cast("int").alias("n_words_chunk"),
        ),
    )
    return staged.select(
        id_col, F.explode(chunks).alias("_c")
    ).select(
        id_col, "_c.chunk_idx", "_c.chunk_text", "_c.n_words_chunk"
    )


def example_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-example fill statistics over ``pack_sequences`` output:
    (example_id, n_docs, n_tokens, overflow) — ``overflow`` is the
    tokens past ``budget`` contributed by the boundary-straddling last
    document (0 for exactly-filled examples). One map-side-combined
    groupBy on example_id (uniform key: examples are fixed-size by
    construction)."""
    return (
        packed.groupBy("example_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens_example"),
            F.min("cum_before").cast("long").alias("_start"),
        )
        .select(
            "example_id",
            "n_docs",
            "n_tokens_example",
            F.greatest(
                F.col("_start") + F.col("n_tokens_example")
                - (F.col("example_id") + 1) * F.lit(budget),
                F.lit(0).cast("long"),
            ).alias("overflow"),
        )
    )
