"""Vector column functions for embedding similarity.

Dot products and cosines over ``array<float>`` columns using
``F.zip_with`` + ``F.aggregate`` — JVM-side, left-to-right fold order
(deterministic, unlike a distributed float SUM). Elements are cast to
double first so both the Spark path and any float64 oracle compute the
same IEEE sequence.

At the 100 TB design point these feed the similarity-search operators
(operators/similarity.py): the expressions themselves are
embarrassingly parallel; all distribution decisions (broadcast of the
query side, bucketing of the corpus side) live in the operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot_product(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ with fixed left-to-right accumulation."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def sign_bucket(v: Column, bits: int = 8) -> Column:
    """Sign-quantization bucket id: bit i set iff v[i] > 0.

    A deterministic LSH/IVF-style coarse quantizer — 2^bits buckets —
    used to prune the candidate set of a similarity search from |corpus|
    to |bucket|. Exact float comparison against 0 is stable across
    engines, which keeps the bucketed path oracle-checkable.
    """
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.when(
            F.element_at(v, i + 1).cast("double") > 0.0, F.lit(2**i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return out
