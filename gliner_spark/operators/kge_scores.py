"""Triple-plausibility scoring over an emitted triples table (M14).

Appends a ``kge_score`` column to triples(subj_text, pred, obj_text,…)
by embedding the three surfaces (mean-pooled token vectors — the same
M8 representation the linker uses) and applying a KGE interaction
(model/kge.py). At scale this is the refinement pass between raw
extraction and graph materialization: rank edges per (subj, pred) and
drop the implausible tail.

Arrow-batched ``mapInPandas``; the encoder is the worker-level
singleton; no shuffle is introduced (per-row scoring).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from ..model.encoder import get_encoder
from ..model.kge import score_triples_np


# surface → mean-pooled unit vector, per (dim, seed). Triple surfaces
# are Zipf-heavy across Arrow batches; without this every batch re-pools
# the same few thousand entity strings word by word in Python (the cost
# center the round-2 profile flagged on kg_triples_kge_ranked).
_SURFACE_CACHE: dict = {}
_SURFACE_CACHE_MAX = 2_000_000


def _embed_batch(enc, texts) -> np.ndarray:
    cache = _SURFACE_CACHE.setdefault((enc.dim, enc.seed), {})
    if len(cache) > _SURFACE_CACHE_MAX:  # bound executor memory
        cache.clear()
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
) -> DataFrame:
    """triples → triples + ``kge_score double``."""
    cols = triples.columns
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in triples.schema)
    schema += ", kge_score double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        enc = get_encoder(dim, seed)
        for pdf in batches:
            out = pdf.copy()
            if len(pdf):
                # The score is a deterministic function of the three
                # surfaces, and surface triples repeat heavily (Zipf) —
                # score each DISTINCT (subj, pred, obj) once per Arrow
                # batch and map back. Bit-identical (per-row math is
                # independent of batch composition), no extra shuffle.
                uniq = pd.DataFrame(
                    {
                        "s": pdf[subj_col].astype(str),
                        "p": pdf[pred_col].astype(str),
                        "o": pdf[obj_col].astype(str),
                    }
                ).drop_duplicates()
                h = _embed_batch(enc, uniq["s"])
                r = _embed_batch(enc, uniq["p"])
                t = _embed_batch(enc, uniq["o"])
                scores = score_triples_np(h, r, t, method)
                lut = {
                    key: float(v)
                    for key, v in zip(
                        zip(uniq["s"], uniq["p"], uniq["o"]), scores
                    )
                }
                out["kge_score"] = [
                    lut[(str(s), str(p), str(o))]
                    for s, p, o in zip(pdf[subj_col], pdf[pred_col], pdf[obj_col])
                ]
            else:
                out["kge_score"] = pd.Series([], dtype="float64")
            yield out

    return triples.mapInPandas(run, schema)
