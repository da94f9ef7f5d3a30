"""Zero-shot benchmark harness (SURVEY.md §2.6 A6).

The reference's ``get_for_all_path`` (gliner/evaluation/
evaluate_ner.py:177-272) loops benchmark datasets, evaluates each with
its own label vocabulary (flat vs nested chosen by dataset name,
:166-168), and reports per-dataset micro-F1 plus the average. This is
the distributed re-expression: each dataset is an independent
(docs, gold, labels) bundle; extraction runs per dataset with that
dataset's prompt labels; metrics are the join-based evaluators
(operators/evaluation.py); results union into one metrics DataFrame
with an ``average`` summary row — the results.txt/tables.txt sink
(evaluate_ner.py:213-272) becomes a writable metrics table (S6).
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from .evaluation import micro_prf
from .extract import extract_entities

# datasets evaluated with nested (non-flat) NER, evaluate_ner.py:166-168
NESTED_NAME_MARKERS = ("ace", "genia", "corpus")


def flat_ner_for(dataset_name: str) -> bool:
    low = dataset_name.lower()
    return not any(m in low for m in NESTED_NAME_MARKERS)


def sample_train_mix(
    dfs, per_dataset: int = 10_000, seed: int = 42
) -> DataFrame:
    """Shuffle + take ``per_dataset`` rows from each dataset, union —
    the reference's train-mix sampler (evaluate_ner.py:275-330, A8) as
    DataFrame ops. Deterministic via the seeded rand() sort key."""
    out = None
    for df in dfs:
        part = df.orderBy(F.rand(seed)).limit(per_dataset)
        out = part if out is None else out.unionByName(part)
    return out


def zero_shot_benchmark(
    spark: SparkSession,
    datasets: Dict[str, dict],
    threshold: float = 0.5,
    scoring: Optional[str] = None,
) -> DataFrame:
    """datasets: name → {docs, gold, labels[, gazetteer, flat_ner]} →
    metrics DataFrame (dataset, n_pred, n_gold, tp, precision, recall,
    f1) + one ``average`` row (mean F1 across datasets, the headline
    number of the zero-shot protocol)."""
    per_ds = []
    f1s = []
    for name in sorted(datasets):
        d = datasets[name]
        flat = d.get("flat_ner", flat_ner_for(name))
        kwargs = {}
        if scoring:
            kwargs["scoring"] = scoring
        pred = extract_entities(
            d["docs"],
            labels=d["labels"],
            threshold=threshold,
            flat_ner=flat,
            lang_col=None,
            gazetteer=d.get("gazetteer"),
            **kwargs,
        )
        row = micro_prf(pred, d["gold"]).first()
        f1s.append(row.f1)
        per_ds.append(
            (name, row.n_pred, row.n_gold, row.tp,
             row.precision, row.recall, row.f1)
        )
    avg = sum(f1s) / len(f1s) if f1s else 0.0
    per_ds.append(("average", None, None, None, None, None, avg))
    return spark.createDataFrame(
        per_ds,
        "dataset string, n_pred long, n_gold long, tp long, "
        "precision double, recall double, f1 double",
    )
