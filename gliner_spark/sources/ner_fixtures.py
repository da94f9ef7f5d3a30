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


def relex_gold_records(n: int = 30, seed: int = 42) -> List[dict]:
    """Relex-format gold records (FIXTURES.md §3, mirroring
    processor.py:1570-1654): word-level end-inclusive ``ner`` spans and
    ``relations`` whose head/tail indices refer to the entity list
    AFTER an (start, end) sort (processor.py:129-150)."""
    rng = random.Random(seed)
    people = ["alice", "bob", "carol"]
    orgs = ["acme", "globex", "initech"]
    recs = []
    for i in range(n):
        p, o = rng.choice(people), rng.choice(orgs)
        pre = [rng.choice(_FILLER) for _ in range(rng.randint(1, 4))]
        toks = pre + [p, "works", "at", o, "now"]
        p_idx = len(pre)
        o_idx = len(pre) + 3
        ner = [
            (p_idx, p_idx, "person"),
            (o_idx, o_idx, "organization"),
        ]
        # already (start, end)-sorted → relation indices are positional
        recs.append(
            {
                "url": f"relex://doc/{i}",
                "tokenized_text": toks,
                "ner": ner,
                "relations": [(0, 1, "works_at")],
                "rel_labels": ["works_at"],
            }
        )
    return recs


def relex_gold_frames(spark: SparkSession, n: int = 30, seed: int = 42):
    """(pages_df, gold_triples_df) in the pipeline's char-offset shape.

    Converts the reference-format records into (a) a text corpus and
    (b) a gold triples table keyed the way relex_micro_prf joins
    (url, pred, subj/obj char spans).
    """
    recs = relex_gold_records(n, seed)
    pages = spark.createDataFrame(
        [(r["url"], " ".join(r["tokenized_text"]), "en") for r in recs],
        "url string, text string, lang string",
    )
    rows = []
    for r in recs:
        ner_sorted = sorted(r["ner"])  # processor.py:129-150 ordering
        char_spans = word_spans_to_char(r["tokenized_text"], ner_sorted)
        for h, t, rel in r["relations"]:
            hs, he, _ = char_spans[h]
            ts, te, _ = char_spans[t]
            rows.append((r["url"], rel, hs, he, ts, te))
    gold = spark.createDataFrame(
        rows,
        "url string, pred string, subj_start int, subj_end int, "
        "obj_start int, obj_end int",
    )
    return pages, gold


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
