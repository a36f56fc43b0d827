"""Text-analysis query surface over ``documents`` — SURVEY.md Q36 + the
north-star text operators (token counting, quality components,
fingerprinting, language stats)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from sparkflow_spark.catalog import Tables
from sparkflow_spark.functions.text import (
    bpe_ish_token_count,
    detect_lang,
    fingerprint,
    punct_count,
    quality_score,
    simhash64,
    token_count,
)
from sparkflow_spark.queries import register


@register(
    "q36_lang_stats",
    oracle="""
        SELECT lang, COUNT(*) AS c, CAST(SUM(n_chars) AS BIGINT) AS s
        FROM documents GROUP BY lang ORDER BY lang
    """,
    tags=("text", "agg"),
)
def q36(spark: SparkSession, sf: str) -> DataFrame:
    t = Tables(spark, sf)
    return (
        t.documents.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("n_chars").cast("bigint").alias("s"))
        .orderBy("lang")
    )


@register(
    "t_token_count",
    oracle="""
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
        FROM documents ORDER BY doc_id
    """,
    tags=("text",),
)
def t_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """Whitespace token count — Catalyst split/filter, no UDF."""
    t = Tables(spark, sf)
    return t.documents.select("doc_id", token_count("text").alias("n_tokens")).orderBy("doc_id")


@register(
    "t_punct_count",
    oracle="""
        SELECT doc_id,
               CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))
                 AS BIGINT) AS n_punct
        FROM documents ORDER BY doc_id
    """,
    tags=("text",),
)
def t_punct(spark: SparkSession, sf: str) -> DataFrame:
    """Punctuation density component of the quality score."""
    t = Tables(spark, sf)
    return t.documents.select("doc_id", punct_count("text").alias("n_punct")).orderBy("doc_id")


@register(
    "t_fingerprint",
    oracle="""
        SELECT doc_id,
               md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
        FROM documents ORDER BY doc_id
    """,
    tags=("text", "dedup"),
)
def t_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-engine md5 content fingerprint (dedup key)."""
    t = Tables(spark, sf)
    return t.documents.select("doc_id", fingerprint("text").alias("fp")).orderBy("doc_id")


@register(
    "t_quality_langid",
    oracle=None,  # heuristic scores are engine-defined; accuracy checked in tests
    tags=("text", "heuristic"),
)
def t_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Quality score + language-ID + BPE-ish token estimate + simhash, one
    pass over documents — all Catalyst expressions, zero UDFs."""
    t = Tables(spark, sf)
    return (
        t.documents.select(
            "doc_id",
            quality_score("text").alias("quality"),
            detect_lang("text").alias("lang_pred"),
            bpe_ish_token_count("text").alias("n_bpe_tokens"),
            simhash64("text").alias("simhash"),
        )
        .orderBy("doc_id")
    )
