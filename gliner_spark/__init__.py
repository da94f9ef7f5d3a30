"""gliner_spark — a PySpark-native knowledge-graph construction engine.

Re-implements, Spark-first and from scratch, the query/data-processing
capabilities of the reference GLiNER library (zero-shot span-based NER +
joint entity/relation extraction): tokenization, prompt construction, span
enumeration, span-vs-label scoring, greedy decoding, triple extraction,
entity linking, canonicalization, evaluation metrics — plus the
training-data-pipeline operators a 100 TB corpus needs (dedup families,
similarity search, text quality, multimodal plumbing).

Layout:
  kernel/     pure-Python/numpy parity kernels (no Spark imports)
  model/      deterministic encoder + batched inference pipeline
  operators/  DataFrame-level operators (extract, dedup, linking, eval, ...)
  sources/    corpus readers + deterministic synthetic `pages` generator
  functions/  reusable Column expressions (vector math, text hashing)
  plans/      session tuning, skew handling, lineage/manifest checkpointing
  streaming/  Structured Streaming wrappers (foreachBatch + idempotent sink)

All heavy per-row work happens in Arrow-batched pandas UDFs
(`mapInPandas`) — no row-at-a-time Python UDFs anywhere.
"""

__version__ = "0.1.0"
