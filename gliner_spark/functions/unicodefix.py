"""Unicode NFC normalization — the standard web-text canonicalization
pass that has NO Spark SQL builtin.

Re-crawled and scraped web text mixes precomposed and combining-mark
encodings of the same glyphs ("café" as ``caf\\u00e9`` vs
``cafe\\u0301``); every downstream byte-keyed operator — exact dedup's
md5, shingle joins, gazetteer term matching, URL canonicalization —
treats the two as different documents/terms unless text is normalized
first. NFC is the lossless form (canonical composition only; unlike
NFKC it never folds ligatures/width, so no information is destroyed).

Spark has no unicode-normalize expression, so this is a legitimate
Arrow-batched pandas UDF (vectorized transfer; the per-string work is
a C-level ``unicodedata.normalize`` call). DuckDB's ``nfc_normalize``
computes the identical function (both implement UAX #15), which keeps
the gate hash-exact. ASCII-only batches short-circuit:
``is_normalized`` is O(n) and True for ASCII, so the common case
never re-allocates.
"""

from __future__ import annotations

from pyspark.sql import Column

_UDF_CACHE: list = []


def nfc_normalize_udf():
    """Factory returning the Arrow-batched NFC normalizer UDF.

    A factory (not a module-level ``pandas_udf``) so importing this
    module never touches Spark session machinery — the same pattern as
    the IVF cell-assignment UDF. The built UDF is memoized: repeated
    ``nfc_normalize(col)`` calls in one plan share a single function
    object, so Catalyst's PythonUDF expression equality can dedup them
    instead of shipping the column through Arrow once per call site.
    """
    if _UDF_CACHE:
        return _UDF_CACHE[0]
    import unicodedata

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def norm(s):
        def one(t):
            if not isinstance(t, str):
                return t
            if unicodedata.is_normalized("NFC", t):
                return t  # ASCII/already-NFC fast path, no realloc
            return unicodedata.normalize("NFC", t)

        return s.map(one)

    norm.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _UDF_CACHE.append(pandas_udf(norm, "string"))
    return _UDF_CACHE[0]


def nfc_normalize(text: Column) -> Column:
    """NFC-normalized ``text`` (see module docstring)."""
    return nfc_normalize_udf()(text)
