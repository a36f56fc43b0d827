"""Column-level function library (all JVM-side Catalyst expressions).

Everything here returns ``pyspark.sql.Column`` built from built-in
functions — no Python UDFs in the hot path. These stay inside
whole-stage codegen and are usable in both batch and streaming plans.
"""

from sparkflow_spark.functions.vector import (
    dot,
    l2_norm,
    cosine_similarity,
    normalize,
)
from sparkflow_spark.functions.text import (
    token_count,
    tokens,
    char_ngrams,
    word_shingles,
    punct_ratio,
    stopword_ratio,
    quality_score,
    simhash64,
    fingerprint,
)

__all__ = [
    "dot",
    "l2_norm",
    "cosine_similarity",
    "normalize",
    "token_count",
    "tokens",
    "char_ngrams",
    "word_shingles",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "simhash64",
    "fingerprint",
]
