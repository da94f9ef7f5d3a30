"""Multitask prompt pipelines as table-level operators.

The reference wraps its NER core in prompt-based task pipelines
(gliner/multitask/base.py:99-129): format a prompt, run extraction with
synthetic labels, post-process. This module re-expresses each as a
DataFrame → DataFrame operator over the same Arrow-batched kernel:

| pipeline        | reference                                   | here |
|---|---|---|
| classification  | multitask/classification.py:38,168          | classify_documents |
| question answer | multitask/question_answering.py:34,97       | answer_questions |
| summarization   | multitask/summarization.py:33,91            | summarize_documents |
| open IE         | multitask/open_extraction.py:33-84          | open_extract |
| prompt relex    | multitask/relation_extraction.py:82-155     | prompt_mode_relations |

NOTE the reference's multitask classes call ``self.model.run(...)``
which does not exist in the refactored model (dead API — SURVEY.md
§2.8); semantics here follow the live ``inference`` contract instead.

All per-row work stays in vectorized ``mapInPandas`` (no per-row Python
UDFs); prompt prefixes are prepended to the text and offsets shifted
back after decode, preserving the byte-identical-slice invariant with
respect to the ORIGINAL text column.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .extract import _ensure_parallelism, _get_pipeline

CLASSIFY_SCHEMA = "url string, label string, score double"
QA_SCHEMA = "url string, answer string, start int, end int, score double"
SUMMARY_SCHEMA = "url string, summary string, n_spans int"
OPEN_SCHEMA = "url string, start int, end int, text string, score double"
PROMPT_REL_SCHEMA = (
    "url string, subj_text string, pred string, "
    "obj_start int, obj_end int, obj_text string, score double"
)


def classify_documents(
    df: DataFrame,
    classes: Sequence[str],
    threshold: float = 0.25,
    multi_label: bool = False,
    url_col: str = "url",
    text_col: str = "text",
    gazetteer: Optional[dict] = None,
    min_partitions: Optional[int] = None,
    **cfg_kwargs,
) -> DataFrame:
    """Zero-shot classification: best class(es) per document.

    Mirrors the reference's recipe: the classification prompt
    ``"Classify text into the following classes: {…}"`` is prepended to
    the document exactly as ``prepare_texts`` does
    (multitask/classification.py:38,168 — ``f"{prompt} \\n {text}"``),
    classes run as entity labels, and span×class scores are aggregated
    per document (``process_predictions`` keeps labels+scores only, so
    no offset shift-back is needed). Single-label mode keeps the argmax
    class, multi-label keeps every class whose best span clears the
    threshold.
    """
    classes = list(classes)
    cfg = dict(threshold=threshold, flat_ner=False, multi_label=True)
    cfg.update(cfg_kwargs)
    prompt_prefix = (
        "Classify text into the following classes: " + ", ".join(classes) + " \n "
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pipe = _get_pipeline(classes, [], cfg, gazetteer=gazetteer)
        for pdf in batches:
            rows = []
            for url, text in zip(pdf[url_col], pdf[text_col]):
                best: dict = {}
                for e in pipe.predict_entities(prompt_prefix + (text or ""), "en"):
                    cur = best.get(e["label"])
                    if cur is None or e["score"] > cur:
                        best[e["label"]] = e["score"]
                if not best:
                    continue
                if multi_label:
                    for lab, sc in best.items():
                        rows.append((url, lab, float(sc)))
                else:
                    lab = max(best, key=lambda k: (best[k], -classes.index(k)))
                    rows.append((url, lab, float(best[lab])))
            yield pd.DataFrame(rows, columns=["url", "label", "score"])

    return _ensure_parallelism(df.select(url_col, text_col), min_partitions).mapInPandas(
        run, CLASSIFY_SCHEMA
    )


def answer_questions(
    df: DataFrame,
    threshold: float = 0.5,
    url_col: str = "url",
    text_col: str = "text",
    question_col: str = "question",
    gazetteer: Optional[dict] = None,
    min_partitions: Optional[int] = None,
    **cfg_kwargs,
) -> DataFrame:
    """Extractive QA: per-row question prepended as a prompt, answers
    decoded as spans of the ORIGINAL text (offsets shifted back by the
    prompt length, spans inside the prompt dropped) — the offset-shift
    semantics of multitask/question_answering.py:34,97.
    """
    cfg = dict(threshold=threshold, flat_ner=True)
    cfg.update(cfg_kwargs)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pipe = _get_pipeline(["answer"], [], cfg, gazetteer=gazetteer)
        for pdf in batches:
            rows = []
            for url, text, q in zip(pdf[url_col], pdf[text_col], pdf[question_col]):
                prefix = f"Answer the following question: {q} "
                shift = len(prefix)
                for e in pipe.predict_entities(prefix + (text or ""), "en"):
                    s, t = e["start"] - shift, e["end"] - shift
                    if s < 0:
                        continue  # span inside the prompt
                    rows.append((url, e["text"], s, t, float(e["score"])))
            yield pd.DataFrame(
                rows, columns=["url", "answer", "start", "end", "score"]
            )

    cols = [url_col, text_col, question_col]
    return _ensure_parallelism(df.select(*cols), min_partitions).mapInPandas(
        run, QA_SCHEMA
    )


def summarize_documents(
    df: DataFrame,
    top_k: int = 3,
    threshold: float = 0.25,
    url_col: str = "url",
    text_col: str = "text",
    gazetteer: Optional[dict] = None,
    min_partitions: Optional[int] = None,
    **cfg_kwargs,
) -> DataFrame:
    """Extractive summarization: top-k highest-scoring "summary" spans
    in document order, joined — multitask/summarization.py:33,91."""
    cfg = dict(threshold=threshold, flat_ner=True)
    cfg.update(cfg_kwargs)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pipe = _get_pipeline(["summary"], [], cfg, gazetteer=gazetteer)
        for pdf in batches:
            rows = []
            for url, text in zip(pdf[url_col], pdf[text_col]):
                ents = pipe.predict_entities(text, "en")
                top = sorted(ents, key=lambda e: -e["score"])[:top_k]
                top.sort(key=lambda e: e["start"])  # document order
                if top:
                    rows.append(
                        (url, " ".join(e["text"] for e in top), len(top))
                    )
            yield pd.DataFrame(rows, columns=["url", "summary", "n_spans"])

    return _ensure_parallelism(df.select(url_col, text_col), min_partitions).mapInPandas(
        run, SUMMARY_SCHEMA
    )


def open_extract(
    df: DataFrame,
    prompt: str,
    threshold: float = 0.5,
    url_col: str = "url",
    text_col: str = "text",
    gazetteer: Optional[dict] = None,
    min_partitions: Optional[int] = None,
    **cfg_kwargs,
) -> DataFrame:
    """Open IE: a free-form prompt prefix + the synthetic ``match``
    label (multitask/open_extraction.py:33-84); spans come back in
    original-text offsets."""
    cfg = dict(threshold=threshold, flat_ner=True)
    cfg.update(cfg_kwargs)
    prefix = prompt.rstrip() + " "

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pipe = _get_pipeline(["match"], [], cfg, gazetteer=gazetteer)
        shift = len(prefix)
        for pdf in batches:
            rows = []
            for url, text in zip(pdf[url_col], pdf[text_col]):
                for e in pipe.predict_entities(prefix + (text or ""), "en"):
                    s, t = e["start"] - shift, e["end"] - shift
                    if s < 0:
                        continue
                    rows.append((url, s, t, e["text"], float(e["score"])))
            yield pd.DataFrame(
                rows, columns=["url", "start", "end", "text", "score"]
            )

    return _ensure_parallelism(df.select(url_col, text_col), min_partitions).mapInPandas(
        run, OPEN_SCHEMA
    )


def prompt_mode_relations(
    df: DataFrame,
    relations: Sequence[str],
    mention_gazetteer: Optional[dict] = None,
    mention_labels: Sequence[str] = ("named entity",),
    threshold: float = 0.5,
    pair_gazetteer: Optional[dict] = None,
    url_col: str = "url",
    text_col: str = "text",
    min_partitions: Optional[int] = None,
) -> DataFrame:
    """Two-pass prompt-mode relation extraction
    (multitask/relation_extraction.py:82-155):

    pass 1 — NER with generic mention labels (``["named entity"]`` in
    the reference; a mention gazetteer here for the deterministic
    backend) finds head entities;

    pass 2 — per document, synthesize one label ``f"{head} <> {rel}"``
    for every (head, relation) pair and run NER again with that
    dynamic label set; each hit is a tail span; the decode splits the
    label on ``" <> "`` to recover (head, relation) exactly as
    relation_extraction.py:129-155 does.

    Emits (url, subj_text, pred, obj span…, score). Dynamic label sets
    are per-document, so pass 2 builds a small per-label-set pipeline
    from the worker-level cache (bounded LRU in extract._get_pipeline).
    """
    relations = list(relations)
    labels1 = (
        sorted(set(mention_gazetteer.values()))
        if mention_gazetteer
        else list(mention_labels)
    )
    cfg1 = dict(threshold=threshold, flat_ner=True)
    if mention_gazetteer:
        cfg1["scoring"] = "gazetteer"
    cfg2 = dict(threshold=threshold, flat_ner=True, multi_label=True)
    if pair_gazetteer:
        cfg2["scoring"] = "gazetteer"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pipe1 = _get_pipeline(labels1, [], cfg1, gazetteer=mention_gazetteer)
        for pdf in batches:
            rows = []
            for url, text in zip(pdf[url_col], pdf[text_col]):
                heads = pipe1.predict_entities(text, "en")
                head_texts = list(dict.fromkeys(e["text"] for e in heads))
                if not head_texts:
                    continue
                pair_labels = [
                    f"{h} <> {r}" for h in head_texts for r in relations
                ]
                pipe2 = _get_pipeline(
                    tuple(pair_labels), [], cfg2, gazetteer=pair_gazetteer
                )
                for e in pipe2.predict_entities(text, "en"):
                    head, _, rel = e["label"].partition(" <> ")
                    rows.append(
                        (
                            url, head, rel,
                            e["start"], e["end"], e["text"],
                            float(e["score"]),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "subj_text", "pred",
                    "obj_start", "obj_end", "obj_text", "score",
                ],
            )

    return _ensure_parallelism(df.select(url_col, text_col), min_partitions).mapInPandas(
        run, PROMPT_REL_SCHEMA
    )
