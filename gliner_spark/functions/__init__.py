"""Column-level functions for the training-data pipeline.

Everything here is built from ``pyspark.sql.functions`` primitives —
JVM-side, whole-stage-codegen-able, no Python UDFs — so filters and
projections composed from them stay pushdown- and codegen-friendly at
the 100 TB design point. The one exception is ``unicodefix`` (NFC
normalization has no Spark builtin): an Arrow-batched pandas UDF with
an is_normalized fast path, documented as such.
"""

from .text import (  # noqa: F401
    word_tokens,
    word_count,
    regex_token_count,
    bpe_ish_token_count,
    char_count,
    stopword_count,
    word_char_sum,
    quality_columns,
    lang_scores,
    lang_id_column,
    shingles,
    shingle_hashes,
    simhash_column,
    fingerprint_agg,
)
from .unicodefix import nfc_normalize, nfc_normalize_udf  # noqa: F401
from .vectors import (  # noqa: F401
    dot_product,
    l2_norm,
    cosine_similarity,
    sign_bucket,
)
from .urls import (  # noqa: F401
    url_domain,
    url_host,
    url_normalize,
    url_path,
    url_strip_fragment,
)
