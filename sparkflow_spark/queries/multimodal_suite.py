"""Multimodal query surface: binary payload stats are oracle-checked
(sha256/octet_length are bit-identical cross-engine); the mapInPandas
featurizer/frame-sampler keep their rows-only originals (arbitrary-byte
contract, numpy-oracle pytest) PLUS r9 t2 twins that hash-check the
same Arrow kernels end to end (mm_feature_check via the hex-digit byte
histogram replay; mm_frame_check via char-slice sha on byte-safe
docs)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from sparkflow_spark import multimodal
from sparkflow_spark.catalog import Tables, fan_out
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
    plumbing): the full Arrow vector pipeline runs (payload encode,
    batch shape, numpy bucketing, ArrayType return), then the final
    select folds the 8-dim vector to one CSV string — the r12 driver
    window proved an ArrayType FINAL column breaks the driver's pandas
    canonicalizer (unhashable numpy.ndarray) before it can even count
    rows, so the registered result carries the vector in sortable form
    (exact float-to-string, lossless to parse back). The raw-vector
    surface stays exercised: extract_features itself returns the
    ArrayType column (numpy-oracle t1 + the hash-checked t2 twin
    mm_feature_check consume it directly)."""
    t = Tables(spark, sf)
    wrapped = multimodal.attach_binary_payload(t.documents).select(
        "doc_id", F.col("media.content").alias("content")
    )
    feats = multimodal.extract_features(wrapped)
    return feats.select(
        "doc_id",
        F.array_join(
            F.transform("features", lambda v: v.cast("string")), ","
        ).alias("features_csv"),
    ).transform(ordered, "doc_id")


_N_FEAT = 8


def _feature_oracle() -> str:
    """DuckDB replay of the Arrow featurizer's byte histogram WITHOUT
    byte-array access: hex(encode(text)) renders the exact UTF-8
    payload two hex digits per byte, and the kernel's bucket
    (byte >> 5) is the first hex digit's value >> 1 — so counting
    even-position hex digits per bucket reproduces the histogram for
    ANY text (multi-byte UTF-8 included), and count/total reproduces
    numpy's float64 division bit-for-bit."""
    digit = (
        "CASE WHEN d <= 57 THEN d - 48 ELSE d - 55 END"  # '0'-'9' / 'A'-'F'
    )
    cols = ", ".join(
        f"""CASE WHEN n > 0 THEN CAST(ROUND(
              CAST(len(list_filter(buckets, v -> v = {b})) AS DOUBLE) / n,
              6) AS DOUBLE) + 0.0
            ELSE CAST(0.0 AS DOUBLE) END AS f{b}"""
        for b in range(_N_FEAT)
    )
    return f"""
        WITH h AS (
            SELECT doc_id, hex(encode(text)) AS hx,
                   octet_length(encode(text)) AS n
            FROM documents),
        bk AS (
            SELECT doc_id, n,
                   list_transform(
                       list_transform(range(0, n),
                           i -> ascii(substr(hx, CAST(2 * i + 1 AS INT), 1))),
                       d -> ({digit}) // 2) AS buckets
            FROM h)
        SELECT doc_id, {cols} FROM bk ORDER BY doc_id
    """


@register(
    "mm_feature_check",
    oracle=_feature_oracle(),
    tags=("multimodal", "udf"),
)
def mm_feature_check(spark: SparkSession, sf: str) -> DataFrame:
    """The t2 twin of mm_feature_extract: the SAME mapInPandas Arrow
    kernel (multimodal.extract_features — numpy byte histogram over the
    modality struct's UTF-8 payload), with its 8-dim feature vector
    unpacked to rounded columns and hash-checked against a from-text
    DuckDB replay. This pins the Arrow plumbing end to end — payload
    encode, batch shape, numpy bucketing, normalization — not just the
    python function (which the numpy-oracle t1 already covers)."""
    t = Tables(spark, sf)
    wrapped = multimodal.attach_binary_payload(t.documents).select(
        "doc_id", F.col("media.content").alias("content")
    )
    feats = multimodal.extract_features(wrapped)
    return feats.select(
        "doc_id",
        *[
            (
                F.round(F.element_at("features", b + 1), 6).cast("double")
                + F.lit(0.0)
            ).alias(f"f{b}")
            for b in range(_N_FEAT)
        ],
    ).transform(ordered, "doc_id")


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
    "mm_frame_check",
    # Self-guarding twin: DuckDB's sha256 takes VARCHAR only, so the
    # byte-slice replay is exact only where byte offsets == char
    # offsets; BOTH sides therefore restrict to docs whose UTF-8
    # payload is pure single-byte (today: every fixture doc — the
    # guard excludes zero rows), and the numpy-oracle t1 keeps covering
    # arbitrary bytes.
    oracle="""
        WITH d AS (
            SELECT doc_id, text, length(text) AS n FROM documents
            WHERE octet_length(encode(text)) = length(text))
        SELECT doc_id, CAST(i AS INT) AS frame_idx,
               sha256(substr(text,
                   CAST(i * greatest(n // 4, 1) + 1 AS INT),
                   CAST(greatest(n // 4, 1) AS INT))) AS frame_sha
        FROM d, range(0, 4) t(i)
        ORDER BY doc_id, frame_idx
    """,
    tags=("multimodal", "udf"),
)
def mm_frame_check(spark: SparkSession, sf: str) -> DataFrame:
    """The t2 twin of mm_frame_sample: the SAME mapInPandas frame
    sampler (uniform byte-chunk fingerprints — multimodal.sample_frames)
    hash-checked against a char-slice DuckDB replay on the byte-safe
    (single-byte-UTF-8) documents. Pins the Arrow fan-out shape AND the
    chunk arithmetic (step = max(len//4, 1), tail dropped, short blobs
    yield empty-chunk hashes) cross-engine."""
    t = Tables(spark, sf)
    ascii_docs = t.documents.where(
        F.octet_length(F.encode(F.col("text"), "UTF-8")) == F.length("text")
    )
    wrapped = multimodal.attach_binary_payload(ascii_docs).select(
        "doc_id", F.col("media.content").alias("content")
    )
    return multimodal.sample_frames(wrapped, n_frames=4).transform(
        ordered, "doc_id", "frame_idx"
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


_PPM_HEADER = b"P6\n4 3\n255\n"  # 4x3 RGB -> 36 raster bytes
_HEX_DIGIT = "CASE WHEN {d} <= 57 THEN {d} - 48 ELSE {d} - 55 END"


def _decode_oracle() -> str:
    """DuckDB replay of mm_decode_check: re-derive the 36 raster bytes
    from hex(encode(text)) (hi*16 + lo per byte) and sum them — the
    exact integer the decoder's float32 [0,1] pixels multiply back to
    (byte/255*255 rounds to the byte exactly in float32, and 36 terms
    keep the float64 sum within 0.001 of the integer)."""
    hi = _HEX_DIGIT.format(d="ascii(substr(hx, CAST(2 * i + 1 AS INT), 1))")
    lo = _HEX_DIGIT.format(d="ascii(substr(hx, CAST(2 * i + 2 AS INT), 1))")
    return f"""
        WITH h AS (
            SELECT doc_id, hex(encode(text)) AS hx,
                   octet_length(encode(text)) AS n
            FROM documents),
        e AS (SELECT doc_id, hx FROM h WHERE n >= 36)
        SELECT doc_id,
               CAST(4 AS INT) AS width,
               CAST(3 AS INT) AS height,
               'RGB' AS mode,
               CAST(list_sum(list_transform(range(0, 36),
                   i -> ({hi}) * 16 + ({lo}))) AS BIGINT) AS byte_sum
        FROM e ORDER BY doc_id
    """


@register(
    "mm_decode_check",
    oracle=_decode_oracle(),
    tags=("multimodal", "udf", "decode"),
)
def mm_decode_check(spark: SparkSession, sf: str) -> DataFrame:
    """The t2 twin of the image-decode stage (r9 verdict ask #8 made
    decode REAL in-sandbox): per document, synthesize a valid 4x3 P6
    PPM whose raster is the first 36 UTF-8 bytes of the text (docs
    shorter than 36 bytes are excluded on both sides), decode it
    through multimodal.decode_image's mapInPandas kernel — built-in
    pure-python codec here, PIL in production, bit-identical on PPM —
    and emit the PARSED width/height/mode plus the raster byte-sum
    recovered from the [0,1] float32 pixels. Hash-checking this against
    the hex-digit DuckDB replay pins header parsing, raster extraction
    and normalization cross-engine, not just "it ran"."""
    t = Tables(spark, sf)
    payload = F.substring(F.encode(F.col("text"), "utf-8"), 1, 36)
    blobs = (
        t.documents.where(F.octet_length(F.encode(F.col("text"), "utf-8")) >= 36)
        .select(
            "doc_id",
            F.concat(F.lit(_PPM_HEADER), payload).alias("content"),
        )
    )
    decoded = multimodal.decode_image(blobs)
    byte_sum = F.round(
        F.aggregate("pixels", F.lit(0.0), lambda acc, x: acc + x) * 255
    ).cast("bigint")
    return decoded.select(
        "doc_id", "width", "height", "mode", byte_sum.alias("byte_sum")
    ).transform(ordered, "doc_id")


_P5_HEADER = b"P5\n9 8\n255\n"  # 9x8 grayscale -> 72 raster bytes

# Per-byte raster construction in pure Catalyst: re-derive byte i from
# the payload hex, clamp into [0,127] with % 128 (headroom so the
# brightness twin's +64 can NEVER clip), re-emit as two hex digits.
_RASTER_SQL = (
    "unhex(concat_ws('', transform(sequence(0, 71), i -> "
    "lpad(hex(CAST(conv(substring(hx, CAST(2*i+1 AS INT), 2), 16, 10) "
    "AS INT) % 128 + {shift}), 2, '0'))))"
)

_DHX = "ascii(substr(hx, CAST(2 * i + {off} AS INT), 1))"
_D1 = _HEX_DIGIT.format(d=_DHX.format(off=1))
_D2 = _HEX_DIGIT.format(d=_DHX.format(off=2))


def _dhash_oracle() -> str:
    """DuckDB replay of the full synthesize→decode→dHash pipeline: the
    raster bytes are re-derived from the text hex ((hi*16+lo) % 128 —
    the brightness twin's +64 provably cannot change any gradient sign,
    so ONE hash per doc stands for both images and n_images = 2*n_docs
    exactly when the Spark pipeline's invariance holds), then the 64
    gradient-sign bits are emitted as the same bitstring."""
    return f"""
        WITH h AS (
            SELECT doc_id, substr(hex(encode(text)), 1, 144) AS hx
            FROM documents WHERE octet_length(encode(text)) >= 72),
        v AS (
            SELECT doc_id,
                   list_transform(range(0, 72),
                       i -> (({_D1}) * 16 + ({_D2})) % 128) AS vs
            FROM h),
        b AS (
            SELECT doc_id,
                   array_to_string(list_transform(range(0, 64), k ->
                       CASE WHEN vs[CAST((k // 8) * 9 + (k % 8) + 1 AS INT)]
                                 > vs[CAST((k // 8) * 9 + (k % 8) + 2 AS INT)]
                            THEN '1' ELSE '0' END), '') AS dhash
            FROM v)
        SELECT dhash,
               CAST(2 * COUNT(*) AS BIGINT) AS n_images,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               MIN(doc_id) AS keeper
        FROM b GROUP BY dhash ORDER BY dhash
    """


@register(
    "mm_dhash_dup_groups",
    oracle=_dhash_oracle(),
    tags=("multimodal", "dedup", "image"),
)
def mm_dhash_dup_groups(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual image near-dup via dHash over the REAL decode path
    (r11 verdict ask #4): per document with >= 72 payload bytes,
    synthesize a 9x8 grayscale P5 PPM whose raster is (byte % 128) of
    the first 72 UTF-8 bytes, PLUS a planted near-identical twin at
    +64 brightness (no clipping by construction, so every horizontal
    gradient SIGN — hence the dHash — is provably identical); decode
    both through multimodal.decode_image's mapInPandas kernel (built-in
    pure-python P5 codec here, PIL in production, bit-identical);
    compute the 64-bit difference hash in pure Catalyst over the [0,1]
    float pixels; group by hash. Every group must carry n_images ==
    2*n_docs — the hash-checked cross-engine pin that the decode +
    dHash pipeline is brightness-invariant, not just that it ran.

    100 TB shape: blobs never shuffle — decode and dHash are
    narrow per-partition stages; only (64-char hash, doc_id) enters the
    group-by exchange. Near-dup beyond exact-hash equality is
    multimodal.dhash_near_pairs (banded hamming equi-join, t1-bound).
    """
    t = Tables(spark, sf)
    # r13: round-robin the one-row-group documents scan across cores
    # BEFORE the raster synthesis (72-element interpreted HOF per row)
    # and the mapInPandas decode — both legs otherwise run single-task
    # (guide §2.5; scale-adaptive no-op once the scan carries splits).
    docs = fan_out(
        t.documents.where(
            F.octet_length(F.encode(F.col("text"), "utf-8")) >= 72
        ).select(
            "doc_id",
            F.substring(F.hex(F.encode(F.col("text"), "utf-8")), 1, 144).alias("hx"),
        )
    )
    header = F.lit(_P5_HEADER)
    # Decode + hash PER LEG, then union the tiny (doc_id, dhash) frames
    # — NOT a union of the content-building selects: Spark's Union
    # constraint rewrite (UnionBase.rewriteConstraints) can throw
    # "key not found: <attr>" on unions of two differently-derived
    # selects over one source (expression-id-dependent, so it surfaces
    # only in some sessions — caught by the r12 ×N probe, not the
    # sweeps); unioning after the mapInPandas stage keeps each leg's
    # constraint map self-contained.
    hashes = None
    for shift in (0, 64):
        leg_blobs = docs.select(
            "doc_id",
            F.concat(header, F.expr(_RASTER_SQL.format(shift=shift))).alias(
                "content"
            ),
        )
        leg_hashes = multimodal.decode_image(leg_blobs).select(
            "doc_id", multimodal.dhash_expr("pixels").alias("dhash")
        )
        hashes = leg_hashes if hashes is None else hashes.unionByName(leg_hashes)
    return (
        hashes.groupBy("dhash")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("keeper"),
        )
        .transform(ordered, "dhash")
    )


# Perturbed-variant raster: ONE pixel (position doc_id % 60) shifted by
# +37 mod 128 — flips at most the 2 gradient-sign bits that pixel
# participates in, so every (original, variant) pair sits at hamming
# distance <= 2 BY CONSTRUCTION and the <=3 banded join must find it.
_RASTER_VARIANT_SQL = (
    "unhex(concat_ws('', transform(sequence(0, 71), i -> "
    "lpad(hex(CASE WHEN i = CAST(doc_id % 60 AS BIGINT) THEN "
    "(CAST(conv(substring(hx, CAST(2*i+1 AS INT), 2), 16, 10) AS INT) % 128 "
    "+ 37) % 128 ELSE "
    "CAST(conv(substring(hx, CAST(2*i+1 AS INT), 2), 16, 10) AS INT) % 128 "
    "END), 2, '0'))))"
)


def _dhash_pairs_oracle() -> str:
    """Brute-force DuckDB replay: derive both legs' rasters from the
    text hex (original = byte % 128 for doc_id % 3 == 0; variant = one
    pixel +37 mod 128 for doc_id % 21 == 0, id + 100000000), compute
    the 64-bit dHash per image, and emit EVERY pair within hamming
    distance 3 by exhaustive comparison — independent of the banded
    pigeonhole the Spark side uses, so the t2 doubles as a
    losslessness check at fixture scale."""
    v_orig = f"(({_D1}) * 16 + ({_D2})) % 128"
    return f"""
        WITH h AS (
            SELECT doc_id, substr(hex(encode(text)), 1, 144) AS hx
            FROM documents
            WHERE octet_length(encode(text)) >= 72 AND doc_id % 3 = 0),
        legs AS (
            SELECT doc_id AS img_id,
                   list_transform(range(0, 72), i -> {v_orig}) AS vs
            FROM h
            UNION ALL
            SELECT doc_id + 100000000 AS img_id,
                   list_transform(range(0, 72),
                       i -> CASE WHEN i = doc_id % 60
                                 THEN (({v_orig}) + 37) % 128
                                 ELSE {v_orig} END) AS vs
            FROM h WHERE doc_id % 21 = 0),
        b AS (
            SELECT img_id,
                   list_transform(range(0, 64), k ->
                       CASE WHEN vs[CAST((k // 8) * 9 + (k % 8) + 1 AS INT)]
                                 > vs[CAST((k // 8) * 9 + (k % 8) + 2 AS INT)]
                            THEN 1 ELSE 0 END) AS bits
            FROM legs)
        SELECT a.img_id AS id_a, c.img_id AS id_b,
               CAST(len(list_filter(range(1, 65),
                    k -> a.bits[CAST(k AS INT)] != c.bits[CAST(k AS INT)]))
                    AS BIGINT) AS hamming
        FROM b a JOIN b c ON a.img_id < c.img_id
        WHERE len(list_filter(range(1, 65),
                  k -> a.bits[CAST(k AS INT)] != c.bits[CAST(k AS INT)])) <= 3
        ORDER BY id_a, id_b
    """


@register(
    "d_dhash_hamming_pairs",
    oracle=_dhash_pairs_oracle(),
    tags=("multimodal", "dedup", "image", "similarity"),
    # r13: fn localCheckpoints the signature table; a memoized plan
    # would re-read those blocks on repeat passes instead of
    # recomputing from parquet
    memo=False,
)
def d_dhash_hamming_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Image near-dup PAIRS through the banded hamming join (X169's
    production path, made t2): originals (doc_id % 3 == 0) plus planted
    one-pixel perturbed variants (doc_id % 21 == 0, +37 mod 128 at
    position doc_id % 60 — at most the 2 adjacent gradient signs flip,
    so every planted pair sits at hamming <= 2 by construction), all
    synthesized, DECODED through the real mapInPandas kernel, hashed in
    Catalyst, and paired by multimodal.dhash_near_pairs (pigeonhole
    bands -> equi-join -> bit_count exact verify). The DuckDB oracle
    brute-forces ALL pairs exhaustively, so the hash match proves the
    banded join lossless on real planted data at every scale — not just
    on the synthetic t1 hashes."""
    t = Tables(spark, sf)
    # r13: same fan-out as mm_dhash_dup_groups — spread the synthesis +
    # decode of the one-row-group scan across cores (guide §2.5)
    docs = fan_out(
        t.documents.where(
            (F.octet_length(F.encode(F.col("text"), "utf-8")) >= 72)
            & (F.col("doc_id") % 3 == 0)
        )
        .select(
            "doc_id",
            F.substring(F.hex(F.encode(F.col("text"), "utf-8")), 1, 144).alias(
                "hx"
            ),
        )
    )
    header = F.lit(_P5_HEADER)
    orig = docs.select(
        F.col("doc_id").alias("img_id"),
        F.concat(header, F.expr(_RASTER_SQL.format(shift=0))).alias("content"),
    )
    variant = docs.where(F.col("doc_id") % 21 == 0).select(
        (F.col("doc_id") + 100000000).alias("img_id"),
        F.concat(header, F.expr(_RASTER_VARIANT_SQL)).alias("content"),
    )
    # per-leg decode+hash, union AFTER the python stage — the pre-union
    # content selects trip Spark's Union constraint rewrite
    # ("key not found: text#N", expression-id-dependent; see
    # mm_dhash_dup_groups for the full note)
    def _leg_hashes(leg):
        return multimodal.decode_image(leg, id_col="img_id").select(
            F.col("doc_id").alias("img_id"),
            multimodal.dhash_expr("pixels").alias("dhash"),
        )

    # Materialize the tiny (img_id, 64-char dhash) signature table ONCE
    # (lazy localCheckpoint: executes inside the timed action) — the
    # banded self-join otherwise drags a full copy of the synthesize +
    # mapInPandas-decode + dHash subtree into EACH join leg, running the
    # expensive Python decode twice per image (guide §8 "decide with
    # small rows, touch the payload once"; plan: 8 scans/4 MapInPandas
    # → 2 scans/2 MapInPandas, see plans/r13).
    hashes = _leg_hashes(orig).unionByName(_leg_hashes(variant)).localCheckpoint(
        eager=False
    )
    return (
        multimodal.dhash_near_pairs(hashes, id_col="img_id", max_hamming=3)
        .withColumn("hamming", F.col("hamming").cast("bigint"))
        .transform(ordered, "id_a", "id_b")
    )


# Constant 44-byte RIFF/WAVE header for 1 channel / 8000 Hz / 16-bit
# PCM / 36 frames (72 data bytes) — derived once from the stdlib wave
# writer, byte-for-byte.
_WAV_HEADER = bytes.fromhex(
    "524946466c00000057415645666d7420100000000100010040"
    "1f0000803e0000020010006461746148000000"
)


def _wav_oracle() -> str:
    """DuckDB replay of the WAV decode: re-derive the 36 little-endian
    int16 samples from the text hex (byte 2i = chars 4i+1..4i+2, byte
    2i+1 = chars 4i+3..4i+4; two's complement at >= 32768) and compute
    the SAME integer-exact features the Arrow kernel emits."""
    lo = _HEX_DIGIT.format(d="ascii(substr(hx, CAST(4 * i + 1 AS INT), 1))")
    lo2 = _HEX_DIGIT.format(d="ascii(substr(hx, CAST(4 * i + 2 AS INT), 1))")
    hi = _HEX_DIGIT.format(d="ascii(substr(hx, CAST(4 * i + 3 AS INT), 1))")
    hi2 = _HEX_DIGIT.format(d="ascii(substr(hx, CAST(4 * i + 4 AS INT), 1))")
    u = f"((({lo}) * 16 + ({lo2})) + 256 * (({hi}) * 16 + ({hi2})))"
    return f"""
        WITH h AS (
            SELECT doc_id, substr(hex(encode(text)), 1, 144) AS hx
            FROM documents WHERE octet_length(encode(text)) >= 72),
        s AS (
            SELECT doc_id,
                   list_transform(range(0, 36), i ->
                       CASE WHEN {u} >= 32768 THEN {u} - 65536
                            ELSE {u} END) AS smp
            FROM h)
        SELECT doc_id,
               CAST(1 AS INT) AS n_channels,
               CAST(8000 AS INT) AS sample_rate,
               CAST(36 AS BIGINT) AS n_frames,
               CAST(list_sum(list_transform(smp, x -> x * x)) AS BIGINT)
                 AS sum_sq,
               CAST(list_max(list_transform(smp, x -> abs(x))) AS INT) AS peak
        FROM s ORDER BY doc_id
    """


@register(
    "mm_wav_decode_check",
    oracle=_wav_oracle(),
    tags=("multimodal", "udf", "decode", "audio"),
)
def mm_wav_decode_check(spark: SparkSession, sf: str) -> DataFrame:
    """REAL in-sandbox AUDIO decode (the audio twin of X159's image
    decode): per document, synthesize a valid 16-bit PCM WAV — constant
    RIFF header + the first 72 UTF-8 bytes as 36 little-endian int16
    samples — decode it through multimodal.decode_audio's mapInPandas
    kernel (stdlib wave module, no external audio libs), and emit the
    PARSED header fields plus integer-exact signal features (sum of
    squared samples, peak |amplitude|). Hash-checking against the
    hex-digit DuckDB replay pins RIFF parsing, PCM word decoding,
    two's-complement handling and the feature arithmetic cross-engine.

    100 TB shape: blobs never shuffle — decode is a narrow Arrow stage;
    only (doc_id, 5 integers) leaves it."""
    t = Tables(spark, sf)
    payload = F.substring(F.encode(F.col("text"), "utf-8"), 1, 72)
    blobs = t.documents.where(
        F.octet_length(F.encode(F.col("text"), "utf-8")) >= 72
    ).select("doc_id", F.concat(F.lit(_WAV_HEADER), payload).alias("content"))
    return multimodal.decode_audio(blobs).transform(ordered, "doc_id")
