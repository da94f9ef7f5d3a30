"""DataFrame-level operators.

Import surface for every operator family (each module's docstring
carries its scale design notes and reference citations):

  extract      Arrow-batched entity/triple extraction (the KG core)
  multitask    classification / QA / summarization / open IE / 2-pass relex
  evaluation   join-based micro & per-label P/R/F1, relex 5-tuple, DocRED F1
  zeroshot     CrossNER/MIT-style benchmark harness + train-mix sampler
  linking      LSH-blocked mention linking
  canonicalize connected components + triple rewriting
  kge_scores   KGE triple-plausibility refinement (TransE/DistMult/...)
  dedup        exact / SimHash / MinHash+LSH / n-gram Jaccard / cosine /
               segment-level (C4-style) sub-document dedup
  decontaminate train/test decontamination (eval-n-gram flag/drop)
  corpus       combined keep-list (quality + dedup + decontamination verdicts)
  similarity   brute-force, sign-bucketed, and KMeans-IVF top-k
  graph_stats  degree statistics + fixed-point integer PageRank over triples
  sessions     gap-based event sessionization (one-shuffle window plan)
  multimodal   binary media columns: metadata, stubbed decode, frames
  seqpack      fixed-budget sequence packing into training examples
               (two-phase distributed prefix sum)
"""

from .canonicalize import canonical_entities, canonicalize_triples, connected_components
from .corpus import corpus_keep_list
from .decontaminate import contamination_flags, decontaminate
from .seqpack import chunk_documents, example_stats, pack_sequences
from .dedup import (
    duplicated_spans,
    embedding_cosine_pairs,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    resolve_duplicate_clusters,
    segment_dedup,
    simhash_pairs,
    simhash_table,
    substring_dedup,
)
from .evaluation import (
    docred_string_f1,
    macro_prf,
    micro_prf,
    per_label_prf,
    relex_micro_prf,
    weighted_prf,
)
from .extract import (
    ENTITY_SCHEMA,
    TRIPLE_SCHEMA,
    extract_entities,
    extract_entities_generative,
    extract_triples,
)
from .kge_scores import score_triples
from .linking import link_mentions
from .lmstats import bigram_array, lm_fluency
from .graph_stats import degree_stats, entity_cooccurrence, pagerank
from .redact import redact_entity_mentions
from .robots import parse_robots, robots_filter, robots_rules_df
from .multimodal import decode_media, frame_sample, media_metadata
from .sessions import sessionize
from .multitask import (
    answer_questions,
    classify_documents,
    open_extract,
    prompt_mode_relations,
    summarize_documents,
)
from .similarity import brute_force_topk, bucketed_topk, ivf_topk, train_ivf_centroids
from .zeroshot import sample_train_mix, zero_shot_benchmark

__all__ = [
    "ENTITY_SCHEMA",
    "TRIPLE_SCHEMA",
    "answer_questions",
    "brute_force_topk",
    "bucketed_topk",
    "canonical_entities",
    "canonicalize_triples",
    "classify_documents",
    "connected_components",
    "chunk_documents",
    "contamination_flags",
    "example_stats",
    "pack_sequences",
    "corpus_keep_list",
    "decode_media",
    "decontaminate",
    "degree_stats",
    "entity_cooccurrence",
    "parse_robots",
    "redact_entity_mentions",
    "robots_filter",
    "robots_rules_df",
    "docred_string_f1",
    "duplicated_spans",
    "embedding_cosine_pairs",
    "exact_duplicates",
    "extract_entities",
    "extract_entities_generative",
    "extract_triples",
    "frame_sample",
    "ivf_topk",
    "link_mentions",
    "lm_fluency",
    "bigram_array",
    "macro_prf",
    "media_metadata",
    "micro_prf",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "open_extract",
    "pagerank",
    "per_label_prf",
    "prompt_mode_relations",
    "relex_micro_prf",
    "resolve_duplicate_clusters",
    "sample_train_mix",
    "score_triples",
    "segment_dedup",
    "substring_dedup",
    "sessionize",
    "simhash_pairs",
    "simhash_table",
    "summarize_documents",
    "train_ivf_centroids",
    "weighted_prf",
    "zero_shot_benchmark",
]
