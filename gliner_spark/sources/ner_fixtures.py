"""CrossNER/MIT-style zero-shot NER fixture datasets.

Replicates the reference's zero-shot benchmark *structure*
(gliner/evaluation/evaluate_ner.py:220-228: several datasets with
disjoint label vocabularies, plus nested-entity sets evaluated with
flat_ner=False per :166-168) as deterministic synthetic data, per
FIXTURES.md §2. Gold spans follow the reference's record format
(word-level, end-inclusive — examples/sample_data.json:1) and are also
materialized as char offsets for the join-based evaluators.
"""

from __future__ import annotations

import random
from typing import Dict, List, Tuple

from pyspark.sql import DataFrame, SparkSession

# dataset name → (label vocabulary, planted surface → label)
DATASETS: Dict[str, Dict[str, str]] = {
    "xner_science": {
        "marie curie": "scientist",
        "nobel prize": "award",
        "polonium": "element",
        "radium": "element",
    },
    "xner_music": {
        "miles davis": "musician",
        "kind of blue": "album",
        "trumpet": "instrument",
    },
    "mit_restaurant": {
        "sushi": "dish",
        "ramen": "dish",
        "blue fin": "restaurant_name",
        "cheap": "price",
    },
}

# nested dataset: one entity contains another (flat_ner=False territory,
# evaluate_ner.py:166-168 routes ACE/GENIA/Corpus this way)
NESTED_DATASET = "ace_nested"
NESTED_OUTER = "university of new york"
NESTED_INNER = "new york"

_FILLER = "today we discuss the topic again with care and detail".split()


def _mk_docs(name: str, gaz: Dict[str, str], n: int, seed: int):
    rng = random.Random(seed)
    docs, gold = [], []
    for i in range(n):
        url = f"{name}://doc/{i}"
        surface = rng.choice(sorted(gaz))
        pre = " ".join(rng.choice(_FILLER) for _ in range(rng.randint(2, 6)))
        post = " ".join(rng.choice(_FILLER) for _ in range(rng.randint(2, 6)))
        text = f"{pre} {surface} {post}"
        s = len(pre) + 1
        gold.append((url, s, s + len(surface), surface, gaz[surface]))
        docs.append((url, text))
    return docs, gold


def fixture_datasets(
    spark: SparkSession, n_per_dataset: int = 40, seed: int = 42
) -> Dict[str, dict]:
    """name → {docs, gold, labels, gazetteer, flat_ner} bundles."""
    out: Dict[str, dict] = {}
    for k, (name, gaz) in enumerate(sorted(DATASETS.items())):
        docs, gold = _mk_docs(name, gaz, n_per_dataset, seed + k)
        out[name] = {
            "docs": spark.createDataFrame(docs, "url string, text string"),
            "gold": spark.createDataFrame(
                gold, "url string, start int, end int, text string, label string"
            ),
            "labels": sorted(set(gaz.values())),
            "gazetteer": gaz,
            "flat_ner": True,
        }

    # nested: outer org + inner location share text; both are gold
    docs, gold = [], []
    rng = random.Random(seed + 99)
    for i in range(n_per_dataset):
        url = f"{NESTED_DATASET}://doc/{i}"
        pre = " ".join(rng.choice(_FILLER) for _ in range(rng.randint(2, 5)))
        text = f"{pre} {NESTED_OUTER} press"
        s_out = len(pre) + 1
        s_in = s_out + len("university of ")
        gold.append((url, s_out, s_out + len(NESTED_OUTER), NESTED_OUTER, "organization"))
        gold.append((url, s_in, s_in + len(NESTED_INNER), NESTED_INNER, "location"))
        docs.append((url, text))
    out[NESTED_DATASET] = {
        "docs": spark.createDataFrame(docs, "url string, text string"),
        "gold": spark.createDataFrame(
            gold, "url string, start int, end int, text string, label string"
        ),
        "labels": ["organization", "location"],
        "gazetteer": {NESTED_OUTER: "organization", NESTED_INNER: "location"},
        "flat_ner": False,  # nested benchmark rule (evaluate_ner.py:166-168)
    }
    return out


def word_spans_to_char(
    tokenized: List[str], ner: List[Tuple[int, int, str]]
) -> List[Tuple[int, int, str]]:
    """Reference gold format (word-level, END-INCLUSIVE) → char offsets
    over ``" ".join(tokenized)`` — the inverse of create_dataset's
    char→word conversion (evaluate_ner.py:48-99)."""
    starts, pos = [], 0
    for tok in tokenized:
        starts.append(pos)
        pos += len(tok) + 1
    out = []
    for ws, we, label in ner:
        out.append((starts[ws], starts[we] + len(tokenized[we]), label))
    return out
