"""The `pages` input corpus.

Per BASELINE.json.input_hint the pipeline's input is an Iceberg table
``pages(url string, warc_ts timestamp, html binary, text string,
lang string)``. Two access paths:

* ``read_pages`` — production: Iceberg when the catalog is configured,
  plain parquet otherwise (same schema). Only (url, text, lang) are
  selected, so Catalyst prunes the heavy ``html`` column at the scan.
* ``synth_pages`` / ``pages_df`` — a deterministic Common-Crawl-style
  generator (seed-fixed) with planted entities and relations at known
  char offsets (FIXTURES.md §1), used by pytest and the benches. It
  deliberately includes: empty/whitespace-only rows (exercising the
  valid-text filter, gliner/model.py:1222-1241), over-max_len rows
  (truncation, processor.py:489-493), hyphen/underscore compounds and
  unicode punctuation (the regex splitter, tokenizer.py:49), and a
  heavily skewed domain/lang distribution (salting tests).
"""

from __future__ import annotations

import datetime as _dt
import random
from typing import Any, Dict, List

from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_PERSONS = [
    "John Smith", "Mary Jones", "Akira Tanaka", "Fatima al-Rashid",
    "Jean-Pierre Dubois", "Olga Petrova", "Li Wei", "Anna Müller",
]
_ORGS = [
    "Acme Corporation", "Globex", "Initech Labs", "Stark-Industries",
    "Wayne_Enterprises", "Hooli", "Umbrella Group", "Cyberdyne Systems",
]
_LOCS = [
    "New York", "Paris", "São Paulo", "Berlin", "Tokyo", "Cape Town",
    "San-Francisco", "Mumbai",
]
_FILLER = (
    "the quick brown fox jumps over the lazy dog and reads daily news "
    "about markets technology culture science sports weather"
).split()

# domain skew: first two domains own >50% of rows (north-rule skew tests)
_DOMAINS = (
    ["big-portal.example"] * 6
    + ["hot-news.example"] * 4
    + ["blog-a.example", "blog-b.example", "shop-c.example", "wiki-d.example"]
)
_LANGS = ["en"] * 7 + ["de", "es", "zh"]


def synth_pages(n: int = 200, seed: int = 42) -> List[Dict[str, Any]]:
    """Deterministic page records with gold annotations.

    Each record: url, warc_ts, html, text, lang, plus
    ``gold_entities`` = [{start, end, text, label}] (char offsets) and
    ``gold_relations`` = [{head_idx, tail_idx, relation}] indexing into
    gold_entities.
    """
    rng = random.Random(seed)
    base_ts = _dt.datetime(2026, 1, 1)
    records: List[Dict[str, Any]] = []
    for i in range(n):
        domain = rng.choice(_DOMAINS)
        lang = rng.choice(_LANGS)
        url = f"https://{domain}/page/{i}"
        ts = base_ts + _dt.timedelta(seconds=i * 37)

        kind = rng.random()
        gold_entities: List[Dict[str, Any]] = []
        gold_relations: List[Dict[str, Any]] = []
        if i % 41 == 0:
            text = ""  # exercise the valid-text filter
        elif i % 41 == 1:
            text = "   \n\t  "
        elif i % 53 == 2:
            # over-max_len doc (>384 words) — truncation path
            text = " ".join(rng.choice(_FILLER) for _ in range(450))
        else:
            person = rng.choice(_PERSONS)
            org = rng.choice(_ORGS)
            loc = rng.choice(_LOCS)
            pre = " ".join(rng.choice(_FILLER) for _ in range(rng.randint(3, 12)))
            mid = " ".join(rng.choice(_FILLER) for _ in range(rng.randint(2, 8)))
            text = f"{pre} {person} works at {org} in {loc} — {mid}."
            p0 = len(pre) + 1
            gold_entities = [
                {"start": p0, "end": p0 + len(person), "text": person, "label": "person"},
            ]
            o0 = p0 + len(person) + len(" works at ")
            gold_entities.append(
                {"start": o0, "end": o0 + len(org), "text": org, "label": "organization"}
            )
            l0 = o0 + len(org) + len(" in ")
            gold_entities.append(
                {"start": l0, "end": l0 + len(loc), "text": loc, "label": "location"}
            )
            gold_relations = [
                {"head_idx": 0, "tail_idx": 1, "relation": "works_at"},
                {"head_idx": 1, "tail_idx": 2, "relation": "located_in"},
            ]
            for e in gold_entities:  # invariant: offsets slice exactly
                assert text[e["start"]: e["end"]] == e["text"]
        records.append(
            {
                "url": url,
                "warc_ts": ts,
                "html": ("<html>" + text[:64] + "</html>").encode("utf-8"),
                "text": text,
                "lang": lang,
                "gold_entities": gold_entities,
                "gold_relations": gold_relations,
            }
        )
    return records


def pages_df(spark: SparkSession, n: int = 200, seed: int = 42) -> DataFrame:
    """Synthetic pages as a DataFrame in the production schema."""
    recs = synth_pages(n, seed)
    rows = [
        (r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in recs
    ]
    return spark.createDataFrame(rows, PAGES_SCHEMA)


def gold_entities_df(spark: SparkSession, n: int = 200, seed: int = 42) -> DataFrame:
    """Planted gold entities, exploded to one row per entity."""
    recs = synth_pages(n, seed)
    rows = []
    for r in recs:
        for e in r["gold_entities"]:
            rows.append((r["url"], e["start"], e["end"], e["text"], e["label"]))
    return spark.createDataFrame(
        rows, "url string, start int, end int, text string, label string"
    )


def read_pages(
    spark: SparkSession,
    path: str,
    columns=("url", "text", "lang"),
    derive_text_from_html: bool = False,
) -> DataFrame:
    """Read the pages corpus, pruning to the needed columns.

    Tries Iceberg (``spark.read.format("iceberg")``) when ``path`` looks
    like a catalog table, else parquet. Selecting only (url, text, lang)
    lets Catalyst drop the BINARY html column at the scan — check
    ``ReadSchema`` in ``.explain("formatted")``.

    ``derive_text_from_html=True`` is the raw-crawl path: rows whose
    ``text`` is NULL/blank get it extracted from the ``html`` binary
    (``functions.html.html_to_text``, still one map stage). The binary
    column is read but dropped before anything shuffles; rows with a
    pre-extracted ``text`` keep it byte-identical (the north rule's
    per-url invariant is against the text column, so extraction must
    never rewrite existing text).
    """
    if "/" not in path:
        df = spark.read.format("iceberg").load(path)
    else:
        df = spark.read.parquet(path)
    if not derive_text_from_html:
        return df.select(*columns)

    from pyspark.sql import functions as F

    from ..functions.html import html_to_text

    cols = [c for c in columns if c != "html"]
    derived = F.coalesce(
        F.when(F.trim(F.col("text")) != "", F.col("text")),
        html_to_text(F.decode(F.col("html"), "UTF-8")),
    )
    return df.select(*cols, "html").withColumn("text", derived).drop("html")
