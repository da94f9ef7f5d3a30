"""Triple-plausibility scoring over an emitted triples table (M14).

Appends a ``kge_score`` column to triples(subj_text, pred, obj_text,…)
by embedding the three surfaces (mean-pooled token vectors — the same
M8 representation the linker uses) and applying a KGE interaction
(model/kge.py). At scale this is the refinement pass between raw
extraction and graph materialization: rank edges per (subj, pred) and
drop the implausible tail.

Scale shape (round-4 rework): the score is a deterministic function of
the three surface STRINGS, so only the DISTINCT (subj, pred, obj)
combinations are scored — one aggregation of the projected key columns
(map-side combined), a Pandas-UDF pass over that small table, then a
hash join of the scores back onto the triples (JVM-side, codegen,
broadcast by default). The triple table itself never enters Python.
This replaced a full-table ``mapInPandas`` that CHAINED onto the
extraction's Python stage — two pipelined Python workers per task cost
~6 s of Arrow/worker round-trips at sf0.1 regardless of compute (the
round-3 "cold path regression" was this plan shape, not the embedding
loop: single-process scoring of the whole sf0.1 table takes 0.1 s).
Scores are bit-identical to the inline form (per-row math independent
of batch composition).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..model.encoder import get_encoder
from ..model.kge import score_triples_np


# surface → mean-pooled unit vector, per (dim, seed). Triple surfaces
# are Zipf-heavy across Arrow batches; without this every batch re-pools
# the same few thousand entity strings word by word in Python.
_SURFACE_CACHE: dict = {}
_SURFACE_CACHE_MAX = 2_000_000
# executor singletons live for the worker's whole life: bound the number
# of per-(dim, seed) sub-caches too (each can hold _SURFACE_CACHE_MAX
# vectors), mirroring the encoder._score_cache fix from round-3 advice
_SURFACE_CACHE_KEYS_MAX = 32


def _embed_batch(enc, texts) -> np.ndarray:
    key = (enc.dim, enc.seed)
    if key not in _SURFACE_CACHE and len(_SURFACE_CACHE) >= _SURFACE_CACHE_KEYS_MAX:
        _SURFACE_CACHE.pop(next(iter(_SURFACE_CACHE)))  # FIFO-evict oldest
    cache = _SURFACE_CACHE.setdefault(key, {})
    if len(cache) > _SURFACE_CACHE_MAX:
        # partial eviction (oldest half, dict preserves insertion
        # order): a wholesale clear() made above-cap vocabularies
        # thrash — every batch recomputed everything (round-3 advice)
        for k in list(cache)[: _SURFACE_CACHE_MAX // 2]:
            del cache[k]
    out = []
    for t in texts:
        t = str(t)
        v = cache.get(t)
        if v is None:
            words = [w for w in t.split() if w] or [t]
            v = np.mean([enc.token_embedding(w) for w in words], axis=0)
            v = v / (np.linalg.norm(v) + 1e-9)
            cache[t] = v
        out.append(v)
    return np.stack(out) if out else np.zeros((0, enc.dim))


def score_triples(
    triples: DataFrame,
    method: str = "transe",
    dim: int = 64,
    seed: int = 42,
    subj_col: str = "subj_text",
    pred_col: str = "pred",
    obj_col: str = "obj_text",
    broadcast_scores: bool = True,
    score_partitions: int = 1,
) -> DataFrame:
    """triples → triples + ``kge_score double``.

    ``broadcast_scores=True`` (default) broadcast-joins the per-distinct
    scores back — right whenever the distinct (subj, pred, obj) set fits
    in executor memory, which Zipf surface distributions give you far
    past the bench scales. Pass ``False`` on corpora whose distinct
    triple set is itself huge; the join then shuffles both sides and
    AQE picks the strategy.

    ``score_partitions`` coalesces the distinct table before the Pandas
    stage (default 1): a single Arrow task scores ~500k distinct
    triples/sec, while each extra Python task costs a worker
    cold-start (~2-3 s measured on this host when the pool has no idle
    worker) — for the Zipf-small distinct sets this operator exists
    for, fewer bigger tasks win. Raise it when the distinct set is
    genuinely large.
    """
    key_t = {
        f.name: f.dataType.simpleString()
        for f in triples.schema
        if f.name in (subj_col, pred_col, obj_col)
    }
    uniq = triples.select(
        F.col(subj_col).alias("_s"),
        F.col(pred_col).alias("_p"),
        F.col(obj_col).alias("_o"),
    ).distinct()
    schema = (
        f"_s {key_t[subj_col]}, _p {key_t[pred_col]}, _o {key_t[obj_col]}, "
        "kge_score double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        enc = get_encoder(dim, seed)
        for pdf in batches:
            out = pdf.copy()
            if len(pdf):
                h = _embed_batch(enc, pdf["_s"])
                r = _embed_batch(enc, pdf["_p"])
                t = _embed_batch(enc, pdf["_o"])
                out["kge_score"] = [
                    float(v) for v in score_triples_np(h, r, t, method)
                ]
            else:
                out["kge_score"] = pd.Series([], dtype="float64")
            yield out

    scored = uniq.coalesce(score_partitions).mapInPandas(run, schema)
    if broadcast_scores:
        scored = F.broadcast(scored)
    cond = (
        triples[subj_col].eqNullSafe(scored["_s"])
        & triples[pred_col].eqNullSafe(scored["_p"])
        & triples[obj_col].eqNullSafe(scored["_o"])
    )
    return triples.join(scored, cond, "left").drop("_s", "_p", "_o")
