"""NER-composed PII redaction — mention scrub the regex classes miss.

``functions/pii.py`` documents its honest scope: regexes catch the
high-precision classes (emails, IPs, phone-like runs) but names,
addresses and contextual identifiers need an NER pass. This operator
is that composition's NER half: it splices every extracted entity
mention out of the document text IN PLACE (char-offset splice, so all
bytes outside the mentions are untouched — the same byte-identity
invariant as extraction itself, reference gliner/model.py:1316-1322),
emitting one row per DOCUMENT with the mention-redacted text. Layer
``functions.pii.redact_pii``/``pii_counts`` over the output column for
the full scrub (NER first, then regex — the inserted markers contain
no digits or '@' so the regex classes cannot be confused by them).

Scale shape: the whole redaction happens INSIDE the same Arrow-batched
``mapInPandas`` that scores the document — one pass, zero shuffles,
the corpus never moves. The tempting alternative (extract mentions →
groupBy(url) → join spans back → expression splice) shuffles the full
corpus twice; at 100 TB that is two exchanges of the text payload for
an operation that is per-row by construction.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence

import pandas as pd

from pyspark.sql import DataFrame

from .extract import _ensure_parallelism, _get_pipeline

REDACT_SCHEMA = "url string, redacted_text string, n_ner_redactions int"


def redact_entity_mentions(
    df: DataFrame,
    labels: Sequence[str],
    threshold: float = 0.5,
    token_format: str = "<{label}>",
    url_col: str = "url",
    text_col: str = "text",
    lang_col: Optional[str] = "lang",
    gazetteer: Optional[dict] = None,
    min_partitions: Optional[int] = None,
    encoder_factory=None,
    encoder_key: Optional[str] = None,
    **cfg_kwargs,
) -> DataFrame:
    """pages(url, text[, lang]) → (url, redacted_text, n_ner_redactions).

    Every entity mention found by the extraction pipeline (same
    backends/knobs as ``extract_entities``: gazetteer mode keeps the
    output SQL-oracle-able, zero-shot/ONNX modes work identically) is
    replaced by ``token_format.format(label=LABEL)`` with the label
    upper-cased — e.g. ``<PERSON>``. Mentions are non-overlapping by
    construction (flat-NER greedy resolution), so a single left-to-right
    splice is exact; all other bytes pass through untouched.
    """
    labels = list(labels)
    cfg = dict(threshold=threshold)
    cfg.update(cfg_kwargs)
    # The char splice is only exact over DISJOINT, start-sorted spans —
    # what flat-NER greedy resolution guarantees. Nested or multi-label
    # output would splice backwards and LEAK bytes of an already
    # "redacted" mention into the output; refuse loudly instead.
    if not cfg.get("flat_ner", True) or cfg.get("multi_label", False):
        raise ValueError(
            "redact_entity_mentions requires disjoint mention spans: "
            "flat_ner=False / multi_label=True produce nested or "
            "duplicate spans the char splice cannot redact exactly"
        )
    has_lang = lang_col is not None and lang_col in df.columns
    cols = [url_col, text_col] + ([lang_col] if has_lang else [])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pipe = _get_pipeline(
            labels, [], cfg, gazetteer=gazetteer,
            encoder_factory=encoder_factory, encoder_key=encoder_key,
        )
        for pdf in batches:
            langs = list(pdf[lang_col]) if has_lang else ["en"] * len(pdf)
            urls = list(pdf[url_col])
            texts = list(pdf[text_col])
            per_doc = pipe.predict_entities_batch(texts, langs)
            rows: List[tuple] = []
            for url, text, ents in zip(urls, texts, per_doc):
                if not isinstance(text, str):
                    rows.append((url, text, 0))
                    continue
                parts: List[str] = []
                pos = 0
                for e in ents:  # already start-sorted, non-overlapping
                    parts.append(text[pos : e["start"]])
                    parts.append(token_format.format(label=e["label"].upper()))
                    pos = e["end"]
                parts.append(text[pos:])
                rows.append((url, "".join(parts), len(ents)))
            yield pd.DataFrame(
                rows, columns=["url", "redacted_text", "n_ner_redactions"]
            )

    return _ensure_parallelism(df.select(*cols), min_partitions).mapInPandas(
        run, REDACT_SCHEMA
    )
