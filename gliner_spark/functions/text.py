"""Text-analysis column functions (language-ID, quality, tokens,
fingerprints, SimHash).

These are the document-hygiene primitives a web-scale training-data
pipeline runs before (and after) KG extraction: token accounting,
quality scoring, n-gram heuristic language ID, and locality-sensitive
document fingerprints for near-dedup. The reference repo's analogs are
its corpus converters (data/process_pilener.py:16-48) and word splitter
(gliner/data_processing/tokenizer.py:40-61); everything beyond that is
net-new scale tooling.

Design rules (enforced throughout):

* built-in expressions only — JVM-side, codegen-friendly, no UDFs;
* no floating-point *aggregations* across rows (sum-of-double order is
  nondeterministic under distributed execution); every float here is a
  per-row int/int division, which is a single exact IEEE-754 op and
  reproducible across engines;
* hashes a DuckDB oracle must reproduce VALUE-for-value are ``md5``
  (identical output in Spark, DuckDB, and Python's hashlib); hashes
  used only as EQUALITY keys (``shingle_hashes``) are composed
  ``xxhash64`` longs — the oracle checks operator OUTPUT, which does
  not depend on the key family, and the hashed form allocates nothing
  per gram (see BENCH.md's allocation-wall section).
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# Default marker vocabularies for the n-gram heuristic language ID.
# Real deployments plug in per-language frequency tables; the mechanism
# (count marker hits per language, argmax with fixed-order tie-break)
# is what matters and is shared with the SQL oracle.
DEFAULT_LANG_MARKERS: Dict[str, Sequence[str]] = {
    "en": ("the", "a", "data"),
    "de": ("batch", "window", "group"),
    "es": ("query", "table", "row"),
    "fr": ("column", "value", "key"),
    "zh": ("hash", "merge", "sort"),
}

DEFAULT_STOPWORDS: Sequence[str] = ("a", "the")


def word_tokens(text: Column) -> Column:
    """Whitespace word tokens as an array column."""
    return F.split(text, " ")


def word_count(text: Column) -> Column:
    return F.size(word_tokens(text))


def regex_token_count(text: Column) -> Column:
    r"""Count of ``\w+`` regex tokens (the reference splitter's word
    class, gliner/data_processing/tokenizer.py:49, minus the compound
    tail which never fires on space-separated ASCII)."""
    return F.size(F.regexp_extract_all(text, F.lit(r"\w+"), 0))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish subword proxy: letter runs, single digits, single
    non-alnum marks — a cheap deterministic stand-in for a real BPE
    vocab that tracks its token count closely on web text."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), 0))


def char_count(text: Column) -> Column:
    return F.length(text)


def stopword_count(text: Column, stopwords: Sequence[str] = DEFAULT_STOPWORDS) -> Column:
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(word_tokens(text), lambda w: F.array_contains(sw, w)))


def word_char_sum(text: Column) -> Column:
    """Total characters inside words (int aggregate over the token
    array — exact, order-independent)."""
    return F.aggregate(
        F.transform(word_tokens(text), F.length),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def quality_columns(
    text: Column,
    stopwords: Sequence[str] = DEFAULT_STOPWORDS,
    min_words: int = 10,
    max_words: int = 1000,
    max_stop_ratio: float = 0.5,
) -> Dict[str, Column]:
    """Quality-scoring column bundle (length / stopword / word-shape
    heuristics à la C4/Gopher filtering rules)."""
    n_words = word_count(text)
    n_stop = stopword_count(text, stopwords)
    n_chars = char_count(text)
    wsum = word_char_sum(text)
    stop_ratio = n_stop.cast("double") / n_words.cast("double")
    mean_word_len = wsum.cast("double") / n_words.cast("double")
    keep = (
        (n_words >= F.lit(min_words))
        & (n_words <= F.lit(max_words))
        & (stop_ratio < F.lit(float(max_stop_ratio)))
    )
    return {
        "n_words": n_words,
        "n_stop": n_stop,
        "n_chars": n_chars,
        "stop_ratio": stop_ratio,
        "mean_word_len": mean_word_len,
        "quality_keep": keep,
    }


def lang_scores(
    text: Column, markers: Dict[str, Sequence[str]] = DEFAULT_LANG_MARKERS
) -> Dict[str, Column]:
    """Per-language marker-hit counts (with multiplicity)."""
    toks = word_tokens(text)
    out = {}
    for lang, words in markers.items():
        arr = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda w: F.array_contains(arr, w)))
    return out


def lang_id_column(
    text: Column, markers: Dict[str, Sequence[str]] = DEFAULT_LANG_MARKERS
) -> Column:
    """Argmax language with fixed-order tie-break (first declared lang
    wins ties) — the deterministic n-gram heuristic language ID."""
    scores = lang_scores(text, markers)
    langs = list(markers.keys())
    expr = F.lit(langs[-1])
    # Build a reverse CASE chain so earlier languages win ties:
    # lang_i chosen iff score_i >= score_j for all j > i and no earlier
    # lang already claimed it.
    for i in range(len(langs) - 2, -1, -1):
        cond = None
        for j in range(i + 1, len(langs)):
            c = scores[langs[i]] >= scores[langs[j]]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(langs[i])).otherwise(expr)
    return expr


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (array<string>), the unit of
    near-dup detection. Built with sequence+transform — no explode here
    so callers control when the row multiplication happens.

    Texts shorter than ``n`` words yield an EMPTY array — without the
    guard, ``F.sequence(0, negative)`` silently generates a DESCENDING
    index range and emits garbage grams for short rows.
    """
    toks = word_tokens(text)
    # Shifted-zip construction instead of indexing `toks` from inside
    # a transform lambda: every expression that embeds `toks` holds
    # its own copy of the split subtree, evaluated independently per
    # row, so the form with the fewest references wins (and this one
    # doesn't bet on the engine short-circuiting lambda captures):
    # grams[i] = toks[i] ++ toks[i+1] ++ … ++ toks[i+n-1].
    grams = toks
    for k in range(1, n):
        shifted = F.slice(
            toks, k + 1, F.greatest(F.size(toks) - k, F.lit(0))
        )
        # zip_with pads the shorter (shifted) side with null;
        # concat_ws skips nulls, so the tail holds partial grams —
        # cut to the L-n+1 true shingles below.
        grams = F.zip_with(
            grams, shifted, lambda a, b: F.concat_ws(" ", a, b)
        )
    grams = F.when(
        F.size(toks) >= F.lit(n),
        F.slice(grams, 1, F.size(toks) - F.lit(n - 1)),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def shingle_hashes(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as 64-bit hashes (array<long>) —
    the allocation-free sibling of :func:`shingles` for callers that
    only ever JOIN or COUNT shingles and never read the gram text
    (jaccard blocking, decontamination probes).

    Same shifted-zip construction, but words hash to longs first and
    each zip step combines hashes with a native ``xxhash64(a, b)``
    instead of allocating an intermediate gram string. Building string
    grams costs (n−1) string allocations per position — measured at
    320k docs that garbage is what caps multi-core scaling of the
    shingle explode (see ``duplicated_spans``); the hashed form
    allocates only the long arrays. Hash equality stands in for gram
    equality: a 64-bit collision adds one phantom shared shingle to
    one doc pair (P ≈ pairs/2^64) — far below any jaccard threshold's
    resolution, and the same contract ``ngram_jaccard_pairs`` already
    accepted by joining on ``xxhash64(shingle)``.

    Null-padding note: the shifted side runs out before the base side;
    ``xxhash64`` skips null inputs (vs concat_ws skipping the null
    string), so tail entries hold partial-gram hashes exactly like the
    string form's partial grams — both are cut by the same slice.
    """
    toks = word_tokens(text)
    wh = F.transform(toks, lambda w: F.xxhash64(w))
    grams = wh
    for k in range(1, n):
        shifted = F.slice(wh, k + 1, F.greatest(F.size(wh) - k, F.lit(0)))
        grams = F.zip_with(grams, shifted, lambda a, b: F.xxhash64(a, b))
    grams = F.when(
        F.size(toks) >= F.lit(n),
        F.slice(grams, 1, F.size(toks) - F.lit(n - 1)),
    ).otherwise(F.array().cast("array<bigint>"))
    return F.array_distinct(grams)


def simhash_column(text: Column, bits: int = 32, ngram: int = 1) -> Column:
    """Per-document SimHash, computed entirely with array expressions
    (no shuffle, no UDF): for each bit, sum ±1 votes of md5(feature)
    across the document's distinct features; bit = vote>0.

    ``ngram=1`` votes over distinct words; ``ngram>1`` votes over word
    n-gram shingles — the right grain when the corpus vocabulary is
    small (distinct-word sets collide, shingle sets don't).

    Packed into a bigint (bits ≤ 62 to stay in signed range).
    """
    if bits > 62:
        raise ValueError("bits must be <= 62 to fit a signed 64-bit simhash")
    if bits % 4 != 0:
        # ndigits = bits//4 hex chars feed the parsed value; a
        # non-multiple of 4 would parse only 4·(bits//4) < bits bits,
        # leaving the top bits permanently 0 — degenerate bands
        raise ValueError("bits must be a multiple of 4 (one md5 hex digit per 4 bits)")
    words = (
        F.array_distinct(word_tokens(text)) if ngram == 1 else shingles(text, ngram)
    )
    ndigits = bits // 4
    # Single pass: hash every feature ONCE, then one aggregate whose
    # accumulator is the per-bit vote vector. The per-bit-aggregate
    # form embedded a fresh copy of the feature array (tokenize +
    # distinct/shingle + md5-per-word) in each of the `bits` vote
    # sums — 32 independent evaluations per row; here `hashes` is the
    # single aggregate argument and the lambdas only touch lambda
    # variables (30% measured at sf0.1, more on longer documents).
    # one string op per feature: parse the md5's leading hex chars to
    # an integer once, then every bit is an integer shift (bit b of
    # the parsed value IS the old hex-digit lookup's bit — see
    # simhash_table for the position algebra); the bit loop unrolls
    # statically so shiftright gets a literal shift
    hashes = F.transform(
        words,
        lambda w: F.conv(F.substring(F.md5(w), 1, ndigits), 16, 10).cast(
            "long"
        ),
    )

    def bit_votes(v: Column) -> Column:
        # vote vector of one feature hash: ±1 per bit
        return F.array(
            *[
                (
                    F.shiftright(v, b).bitwiseAND(F.lit(1)).cast("long") * 2
                    - 1
                )
                for b in range(bits)
            ]
        )

    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(acc, bit_votes(h), lambda a, v: a + v),
    )
    powers = F.array(*[F.lit(2**b).cast("long") for b in range(bits)])
    packed = F.aggregate(
        F.zip_with(
            votes,
            powers,
            lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # NULL text propagates a NULL array through the aggregates; the
    # per-bit form this replaced coerced every null vote to 0 and
    # returned signature 0 — keep that contract (a NULL signature
    # would silently drop the row from every band/XOR comparison)
    return F.coalesce(packed, F.lit(0).cast("long"))


def fingerprint_agg(text: Column, n: int = 3, keep: int = 4) -> Column:
    """Document fingerprint: the ``keep`` lexicographically smallest
    md5(shingle) hex strings, joined with '-'.

    Min-sampling over rolling n-gram hashes — a deterministic winnowing
    variant: two documents share fingerprint components iff they share
    low-hash shingles, so equal fingerprints ⇒ high overlap. Pure array
    expressions, no shuffle.
    """
    hashes = F.array_sort(F.transform(shingles(text, n), F.md5))
    return F.array_join(F.slice(hashes, 1, keep), "-")


def top_terms(
    df,
    text_col: str = "text",
    group_col: str = "lang",
    k: int = 20,
    min_len: int = 1,
):
    """Per-group heavy-hitter vocabulary: the ``k`` most frequent words
    in each ``group_col`` value, rank total-ordered on (count DESC,
    term ASC) so results are deterministic under ties.

    The standard corpus diagnostic before stopword derivation / quality
    filtering (and the same hot-term signal the jaccard stop-shingle
    cap consumes). Plan: explode → map-side-combined count (hot words
    collapse to one row per task BEFORE the exchange — the word
    distribution is Zipfian, which is exactly when partial aggregation
    pays) → per-group window top-k over the aggregated (|vocab|-sized)
    frame, never over the corpus.

    Returns (group, term, n, rank).
    """
    from ..plans.topk import two_phase_topk

    words = df.select(
        F.col(group_col).alias("grp"),
        F.explode(word_tokens(F.col(text_col))).alias("term"),
    ).where(F.length("term") >= min_len)
    counts = words.groupBy("grp", "term").agg(F.count(F.lit(1)).alias("n"))
    # shared lossless two-phase top-k (plans.topk): the final
    # per-group window sorts <= 64k rows instead of the group's whole
    # vocabulary on one task
    return two_phase_topk(
        counts,
        key_cols=["grp"],
        order_cols=[F.desc("n"), F.asc("term")],
        k=k,
        bucket_on="term",
    ).select(F.col("grp").alias(group_col), "term", "n", "rank")
