"""Corpus keep-list: the training-data pipeline's actual deliverable.

Every upstream operator (quality scoring, exact dedup, decontamination)
answers one question; production pipelines need the COMBINED verdict —
one row per document with keep/drop and machine-readable reasons, the
table the downstream training job filters on and the audit trail reads.

Composition (all built-in expressions and blocked joins — no UDFs):

  quality    functions.text.quality_columns (C4/Gopher-style rules)
  exact_dup  dedup.exact_duplicates (md5 groupBy; non-canonical copies drop)
  contaminated decontaminate.contamination_flags (eval-n-gram broadcast)

``reasons`` is a SORTED array of the rules a doc violated (empty =
keep), so the output is deterministic and SQL-oracle-checkable; at
100 TB the three verdicts are one scan each joined on the uniform doc
id — no new shuffle shapes beyond the operators' own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import quality_columns
from .decontaminate import contamination_flags
from .dedup import exact_duplicates


def corpus_keep_list(
    docs: DataFrame,
    eval_df: DataFrame | None = None,
    decontam_n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """docs (+ optional eval set) → (id, keep, reasons).

    Drop reasons (each independently verdictable):
      * ``quality``      — fails the length/stopword heuristics;
      * ``exact_dup``    — an md5-identical copy of a lower-id doc;
      * ``contaminated`` — shares an n-gram with the eval set
        (only when ``eval_df`` is given).
    """
    quality = docs.select(
        F.col(id_col),
        quality_columns(F.col(text_col))["quality_keep"].alias("_q"),
    )
    dups = exact_duplicates(docs, id_col=id_col, text_col=text_col).select(
        F.col(id_col), F.col("is_duplicate").alias("_d")
    )
    out = quality.join(dups, id_col)
    if eval_df is not None:
        cont = contamination_flags(
            docs, eval_df, n=decontam_n, id_col=id_col, text_col=text_col
        ).select(F.col(id_col), F.col("contaminated").alias("_c"))
        out = out.join(cont, id_col)
    else:
        out = out.withColumn("_c", F.lit(False))
    reasons = F.array_sort(
        F.filter(
            F.array(
                F.when(~F.col("_q"), F.lit("quality")),
                F.when(F.col("_d"), F.lit("exact_dup")),
                F.when(F.col("_c"), F.lit("contaminated")),
            ),
            lambda x: x.isNotNull(),
        )
    )
    return out.select(
        F.col(id_col),
        (F.col("_q") & ~F.col("_d") & ~F.col("_c")).alias("keep"),
        reasons.alias("reasons"),
    )


def cap_per_key(
    df: DataFrame,
    key_col: str,
    n: int,
    order_col: str,
    buckets: int = 64,
) -> DataFrame:
    """Keep at most ``n`` rows per ``key_col``, smallest ``order_col``
    first — the per-host document cap web pipelines apply so one giant
    domain can't dominate a training mix (C4 caps per URL host the
    same way).

    The naive ``row_number() OVER (PARTITION BY host)`` puts a hot
    host's entire row set on one task — exactly the skew the north
    rule calls out (a crawl's host distribution is Zipfian). Delegates
    to the shared lossless two-phase top-k (``plans.topk`` — the
    losslessness argument lives there, once, for this and
    ``functions.text.top_terms``).

    Returns the input columns plus ``rank`` (1-based within key).
    Deterministic when ``order_col`` is unique per key (it's the
    tiebreak AND the sort key).
    """
    from ..plans.topk import two_phase_topk

    return two_phase_topk(
        df,
        key_cols=[key_col],
        order_cols=[F.asc(order_col)],
        k=n,
        bucket_on=order_col,
        buckets=buckets,
    )
