"""Multimodal query surface: binary payload stats are oracle-checked
(sha256/octet_length are bit-identical cross-engine); the mapInPandas
featurizer/frame-sampler are engine-defined → rows-only + numpy-oracle
pytest coverage."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from sparkflow_spark import multimodal
from sparkflow_spark.catalog import Tables
from sparkflow_spark.queries import ordered, register


@register(
    "mm_binary_stats",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
               sha256(text) AS content_sha
        FROM documents ORDER BY doc_id
    """,
    tags=("multimodal",),
)
def mm_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Blob size + sha256 through the modality-struct convention."""
    t = Tables(spark, sf)
    wrapped = multimodal.attach_binary_payload(t.documents)
    return (
        multimodal.binary_stats(wrapped)
        .select("doc_id", "n_bytes", "content_sha")
        .transform(ordered, "doc_id")
    )


@register(
    "mm_feature_extract",
    oracle=None,  # deterministic fake; numpy oracle in tests
    tags=("multimodal", "udf"),
)
def mm_features(spark: SparkSession, sf: str) -> DataFrame:
    """mapInPandas featurizer over binary payloads (fake decode, real
    plumbing); emits doc_id + 8-dim feature vector."""
    t = Tables(spark, sf)
    wrapped = multimodal.attach_binary_payload(t.documents).select(
        "doc_id", F.col("media.content").alias("content")
    )
    return multimodal.extract_features(wrapped).transform(ordered, "doc_id")


@register(
    "mm_frame_sample",
    oracle=None,  # deterministic fake; python oracle in tests
    tags=("multimodal", "udf"),
)
def mm_frames(spark: SparkSession, sf: str) -> DataFrame:
    """Frame-sampling fan-out shape: one row per sampled chunk."""
    t = Tables(spark, sf)
    wrapped = multimodal.attach_binary_payload(t.documents).select(
        "doc_id", F.col("media.content").alias("content")
    )
    return multimodal.sample_frames(wrapped, n_frames=4).transform(
        ordered, "doc_id", "frame_idx"
    )


@register(
    "mm_binary_dup_groups",
    oracle="""
        SELECT md5(substr(text, 1, 64)) AS prefix_md5,
               COUNT(*) AS n_copies,
               COUNT(DISTINCT md5(text)) AS n_distinct_full,
               MIN(doc_id) AS keeper
        FROM documents
        GROUP BY 1 HAVING COUNT(*) > 1
        ORDER BY prefix_md5
    """,
    tags=("multimodal", "dedup"),
)
def mm_binary_dup(spark: SparkSession, sf: str) -> DataFrame:
    """Two-level byte dedup for opaque media blobs: candidate groups by
    prefix fingerprint (md5 of the first 64 chars — the cheap prescreen
    that avoids hashing full payloads for singletons), with the exact
    distinct-full-digest count inside each group and keeper = lowest
    doc_id. Only 16-byte digests shuffle; payloads never do."""
    t = Tables(spark, sf)
    docs = t.documents.select("doc_id", "text")
    return (
        docs.groupBy(F.md5(F.substring("text", 1, 64)).alias("prefix_md5"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.count_distinct(F.md5("text")).alias("n_distinct_full"),
            F.min("doc_id").alias("keeper"),
        )
        .where(F.col("n_copies") > 1)
        .transform(ordered, "prefix_md5")
    )


@register(
    "mm_base64_roundtrip",
    oracle="""
        SELECT doc_id,
               base64(CAST(text AS BLOB)) AS b64,
               CAST(octet_length(from_base64(base64(CAST(text AS BLOB))))
                    AS BIGINT) AS n_bytes_back,
               sha256(CAST(from_base64(base64(CAST(text AS BLOB))) AS VARCHAR))
                    AS sha_back
        FROM documents WHERE doc_id % 17 = 0 ORDER BY doc_id
    """,
    tags=("multimodal", "codec"),
)
def mm_base64(spark: SparkSession, sf: str) -> DataFrame:
    """Binary codec plumbing for opaque payload transport (the shape
    every JSON/REST/inline-blob ingest needs): payload → base64 text →
    decode → byte-count + digest, all JVM-side codegen'd expressions on
    the modality struct's binary content — round-trip integrity is
    hash-checked cross-engine. Sampled 1-in-17 so the doubly-encoded
    text column stays a trivial fraction of the scan at any scale."""
    t = Tables(spark, sf)
    wrapped = multimodal.attach_binary_payload(
        t.documents.where(F.col("doc_id") % 17 == 0)
    )
    content = F.col("media.content")
    # Spark's base64 emits MIME-chunked output (CRLF every 76 chars,
    # Commons-Codec heritage); normalize to the canonical unchunked
    # form every other system (incl. DuckDB) produces. unbase64
    # decodes either form, so the round-trip legs are unaffected.
    b64 = F.regexp_replace(F.base64(content), "\r\n", "")
    back = F.unbase64(b64)
    return wrapped.select(
        "doc_id",
        b64.alias("b64"),
        F.octet_length(back).cast("bigint").alias("n_bytes_back"),
        F.sha2(back.cast("string"), 256).alias("sha_back"),
    ).transform(ordered, "doc_id")
