"""Corpus-LM fluency statistics — the CCNet-style quality filter in
exact arithmetic.

CCNet (and most production web pipelines since) filter text by
perplexity under a language model TRAINED ON THE CORPUS DOMAIN: text
whose n-grams the model has never seen is boilerplate, lorem-ipsum,
menu soup, or another language. A float KenLM perplexity is not
engine-reproducible (transcendental logs + cross-row float sums), so
this operator keeps the SIGNAL in exact integer arithmetic:

* the "model" is the corpus' own top-``vocab_k`` unigram vocabulary
  and top-``bigram_k`` bigram table (lossless two-phase top-k,
  deterministic on (count DESC, gram ASC));
* each document scores by how much of it the model covers:
  out-of-vocabulary token count and in-model bigram hit count, plus
  the two INT/INT-exact rates.

Low ``bigram_hit_rate`` ≈ high perplexity; high ``oov_rate`` ≈ wrong
language / noise. Both thresholds are the caller's policy knob, same
as a perplexity cutoff.

Scale shape (the usual corpus-statistics contract):

* gram counting is explode → map-side-combined groupBy(gram) — the
  Zipf head collapses to one row per task before the exchange, the
  result is vocabulary-sized, never corpus-sized;
* top-k runs over the AGGREGATED vocabulary via the shared lossless
  two-phase top-k (``plans.topk``) — no single task ever sorts the
  whole vocabulary;
* the model (≤ vocab_k + bigram_k rows) broadcasts; per-document
  coverage is a broadcast semi-join + one doc-keyed map-side-combined
  count — the document TEXT never crosses a shuffle, only (doc_id,
  partial count) pairs do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import word_tokens
from ..plans.topk import two_phase_topk


def bigram_array(text: Column) -> Column:
    """ALL word bigrams of ``text`` in order, duplicates kept (unlike
    ``functions.text.shingles``, which deduplicates for set-similarity
    — an LM counts occurrences). ``"a b c"`` → ``["a b", "b c"]``;
    texts under 2 words yield an empty array."""
    toks = word_tokens(text)
    shifted = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
    grams = F.zip_with(toks, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.when(
        F.size(toks) >= 2, F.slice(grams, 1, F.size(toks) - 1)
    ).otherwise(F.array().cast("array<string>"))


def _top_grams(grams: DataFrame, k: int) -> DataFrame:
    """Top-``k`` grams by (count DESC, gram ASC) from a (gram) frame."""
    counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("n"))
    return two_phase_topk(
        counts.withColumn("__g", F.lit(0)),
        key_cols=["__g"],
        order_cols=[F.col("n").desc(), F.col("gram").asc()],
        k=k,
        bucket_on="gram",
    ).select("gram")


def lm_fluency(
    df: DataFrame,
    vocab_k: int = 1 << 17,
    bigram_k: int = 1 << 18,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, n_oov, n_bigrams, n_common_bigrams,
    oov_rate, bigram_hit_rate) — per-document coverage under the
    corpus' own top-k unigram/bigram model (see module docstring).

    ``oov_rate`` = n_oov / n_tokens, ``bigram_hit_rate`` =
    n_common_bigrams / n_bigrams (NULL when the document has fewer
    than two words). Both are single IEEE divisions of exact integers
    — engine-reproducible, DuckDB-oracle-exact.
    """
    ids = F.col(id_col).alias("doc_id")
    toks = df.select(
        ids, F.explode(word_tokens(F.col(text_col))).alias("gram")
    )
    bgs = df.select(ids, F.explode(bigram_array(F.col(text_col))).alias("gram"))

    vocab = F.broadcast(_top_grams(toks.select("gram"), vocab_k))
    bvocab = F.broadcast(_top_grams(bgs.select("gram"), bigram_k))

    in_vocab = (
        toks.join(vocab, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("__in_vocab"))
    )
    in_bvocab = (
        bgs.join(bvocab, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("__in_bvocab"))
    )

    n_tokens = F.size(word_tokens(F.col(text_col)))
    base = df.select(
        ids,
        n_tokens.alias("n_tokens"),
        F.greatest(n_tokens - 1, F.lit(0)).alias("n_bigrams"),
    )
    out = (
        base.join(in_vocab, "doc_id", "left")
        .join(in_bvocab, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("__in_vocab", F.lit(0))).alias(
                "n_oov"
            ),
            "n_bigrams",
            F.coalesce("__in_bvocab", F.lit(0)).alias("n_common_bigrams"),
        )
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        "n_bigrams",
        "n_common_bigrams",
        (F.col("n_oov").cast("double") / F.col("n_tokens")).alias("oov_rate"),
        F.when(
            F.col("n_bigrams") > 0,
            F.col("n_common_bigrams").cast("double") / F.col("n_bigrams"),
        ).alias("bigram_hit_rate"),
    )
