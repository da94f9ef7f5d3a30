"""Train/test decontamination: flag corpus docs that leak eval content.

The standard LLM-training-pipeline pass (remove any training document
sharing an n-gram with a benchmark/eval set — the reference point is
GPT-3's 13-gram decontamination; the reference repo itself ships eval
sets whose leakage into web corpora is exactly this hazard): every doc
containing ANY word-n-gram that also occurs in the eval set is flagged
(or dropped), with the hit count for auditability.

Scale shape (100 TB): the EVAL side is small by nature (benchmarks,
thousands of docs) — its distinct n-gram set is built once and rides a
BROADCAST semi-/left-join, so the corpus never shuffles: scan → explode
→ broadcast hash join → groupBy(doc) count (map-side combined). The
corpus-side explode is the only row multiplication and stays inside one
stage. No UDFs; results engine-reproducible (int counts only).

Grams travel as 64-bit hashes (``shingle_hashes``), never as built-up
strings: the gram text is never output, building it allocates
(n−1) strings per corpus position (the memory-bandwidth wall measured
in BENCH.md's substring-scaling section), and the broadcast eval set
shrinks to 8 bytes per gram. A hash collision flags one innocent doc
(P ≈ corpus_grams·eval_grams/2^64) — the over-drop direction, which is
the safe failure mode for decontamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import shingle_hashes


def contamination_flags(
    corpus: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
) -> DataFrame:
    """corpus + eval texts → (id, n_hits, contaminated).

    ``n_hits`` = how many DISTINCT eval n-grams the doc contains;
    ``contaminated`` = n_hits > 0. One output row per corpus doc.
    """
    eval_grams = (
        eval_df.select(F.explode(shingle_hashes(F.col(eval_text_col), n)).alias("gram"))
        .distinct()
    )
    doc_grams = corpus.select(
        F.col(id_col).alias("_id"),
        F.explode(shingle_hashes(F.col(text_col), n)).alias("gram"),
    )
    hits = (
        doc_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_hits"))
    )
    return (
        corpus.select(F.col(id_col).alias("_id"))
        .join(hits, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
) -> DataFrame:
    """Drop contaminated docs; returns the clean corpus (all original
    columns). The flag pass runs as a broadcast left-anti join — the
    corpus is scanned once and never shuffled."""
    eval_grams = (
        eval_df.select(F.explode(shingle_hashes(F.col(eval_text_col), n)).alias("gram"))
        .distinct()
    )
    dirty = (
        corpus.select(
            F.col(id_col),
            F.explode(shingle_hashes(F.col(text_col), n)).alias("gram"),
        )
        .join(F.broadcast(eval_grams), "gram")
        .select(id_col)
        .distinct()
    )
    return corpus.join(dirty, id_col, "left_anti")
