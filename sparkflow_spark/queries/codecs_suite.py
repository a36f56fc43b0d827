"""Avro / Protobuf column-codec entries (SURVEY §2c X181/X182) — the
event-bus payload surface.

Both entries run the FULL wire codec both directions inside Spark
(encode → hex + decode-back in one plan) and hash-check against a
DuckDB replay that recomputes the wire bytes from the source columns
with pure SQL hex algebra (zigzag/varint/length-prefix legs unrolled —
the same engine-portability device as the dHash and WAV replays). A
decode bug can't hide behind an encode bug: the hex pins the encoder
against the SPEC (the oracle never runs the python codec), and the
decoded-back columns pin decoder∘encoder == identity on real data.

Scale shape: one Arrow-batched projection stage per direction, zero
shuffle, zero driver state — codec cost is embarrassingly parallel
per-row CPU and the enclosing plan's pushdown/partitioning is
untouched (plan-audited like every registry entry).
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from pyspark.sql import DataFrame, SparkSession

from sparkflow_spark import codecs
from sparkflow_spark.catalog import Tables
from sparkflow_spark.queries import ordered, register

# ---------------------------------------------------------------------------
# shared source shape: customer with a signed-cents column (zigzag's
# negative leg is live — acctbal < 0 exists in the fixtures), a text
# column, and a NULLable column (avro union leg) / an often-zero column
# (proto3 default-skip leg)

_AVRO_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "Cust",
        "fields": [
            {"name": "key", "type": "long"},
            {"name": "cents", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "seg", "type": ["null", "string"]},
        ],
    }
)

_PB_FIELDS = [
    ("key", 1, "sint64"),
    ("cents", 2, "sint64"),
    ("name", 3, "string"),
    ("nation", 4, "int64"),
]
_PB_DESC = codecs.build_file_descriptor_set("CustMsg", _PB_FIELDS)


def _source(spark: SparkSession, sf: str) -> DataFrame:
    t = Tables(spark, sf)
    return t.customer.select(
        F.col("c_custkey").cast("long").alias("key"),
        # floor, not round: both engines floor the same IEEE double
        F.floor(F.col("c_acctbal") * 100).cast("long").alias("cents"),
        F.col("c_name").alias("name"),
        F.expr("nullif(c_mktsegment, 'BUILDING')").alias("seg"),
        F.col("c_nationkey").cast("long").alias("nation"),
    )


_SOURCE_SQL = """
    SELECT c_custkey AS key,
           CAST(floor(c_acctbal * 100) AS BIGINT) AS cents,
           c_name AS name,
           nullif(c_mktsegment, 'BUILDING') AS seg,
           CAST(c_nationkey AS BIGINT) AS nation
    FROM customer
"""


def _avro_oracle() -> str:
    key_hex = codecs.avro_long_hex_sql("key")
    cents_hex = codecs.avro_long_hex_sql("cents")
    name_hex = codecs.avro_string_hex_sql("name")
    seg_hex = codecs.avro_string_hex_sql("seg")
    return f"""
        SELECT key,
               ({key_hex} || {cents_hex} || {name_hex} ||
                CASE WHEN seg IS NULL THEN '00'
                     ELSE '02' || {seg_hex} END) AS avro_hex,
               cents AS back_cents, name AS back_name, seg AS back_seg
        FROM ({_SOURCE_SQL})
        ORDER BY key
    """


@register(
    "q131_avro_column_codec",
    oracle=_avro_oracle(),
    tags=("codec", "udf"),
)
def q131_avro_column_codec(spark: SparkSession, sf: str) -> DataFrame:
    """X181: to_avro/from_avro column codec (from-scratch Avro binary
    encoding — the spark-avro module is absent from this sandbox, probed:
    AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE). Wire pins riding in-band:
    zigzag varints for both longs (cents < 0 exercises the negative
    leg), zigzag-varint LENGTH prefixes on strings, and the ["null",T]
    union index byte (00 null / 02 value). The oracle recomputes the
    bytes from the SPEC in SQL; back_* pins decode∘encode == id."""
    src = _source(spark, sf)
    enc = src.withColumn(
        "payload", codecs.to_avro(F.struct("key", "cents", "name", "seg"), _AVRO_SCHEMA)
    )
    dec = enc.withColumn("dec", codecs.from_avro("payload", _AVRO_SCHEMA))
    return dec.select(
        "key",
        F.hex("payload").alias("avro_hex"),
        F.col("dec.cents").alias("back_cents"),
        F.col("dec.name").alias("back_name"),
        F.col("dec.seg").alias("back_seg"),
    ).transform(ordered, "key")


def _pb_oracle() -> str:
    zz = codecs.zigzag_sql
    vh = codecs.varint_hex_sql
    key_leg = f"CASE WHEN key = 0 THEN '' ELSE '08' || {vh(zz('key'))} END"
    cents_leg = f"CASE WHEN cents = 0 THEN '' ELSE '10' || {vh(zz('cents'))} END"
    name_leg = (
        "CASE WHEN name = '' THEN '' ELSE '1A' || "
        f"{vh('octet_length(encode(name))')} || hex(encode(name)) END"
    )
    nation_leg = f"CASE WHEN nation = 0 THEN '' ELSE '20' || {vh('nation')} END"
    return f"""
        SELECT key,
               ({key_leg} || {cents_leg} || {name_leg} || {nation_leg}) AS pb_hex,
               cents AS back_cents, name AS back_name, nation AS back_nation
        FROM ({_SOURCE_SQL})
        ORDER BY key
    """


@register(
    "q132_protobuf_column_codec",
    oracle=_pb_oracle(),
    tags=("codec", "udf"),
)
def q132_protobuf_column_codec(spark: SparkSession, sf: str) -> DataFrame:
    """X182: to_protobuf/from_protobuf column codec over the minipb wire
    runtime, driven by a REAL serialized FileDescriptorSet (the protoc
    artifact shape; spark-protobuf is absent from this sandbox, probed:
    PROTOBUF_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE). Wire pins in-band:
    single-byte tags in field-number order, sint64 zigzag vs int64
    plain varints (the avro/pb length-vs-zigzag distinction is a
    cross-format discriminator), PLAIN-varint length prefixes, and
    proto3 implicit presence — c_nationkey = 0 rows carry NO field-4
    bytes and decode back to 0 (default), which the oracle replays with
    the same CASE legs. back_* pins decode∘encode == id including the
    default round-trip."""
    src = _source(spark, sf)
    enc = src.withColumn(
        "payload",
        codecs.to_protobuf(
            F.struct("key", "cents", "name", "nation"), "CustMsg", _PB_DESC
        ),
    )
    dec = enc.withColumn("dec", codecs.from_protobuf("payload", "CustMsg", _PB_DESC))
    return dec.select(
        "key",
        F.hex("payload").alias("pb_hex"),
        F.col("dec.cents").alias("back_cents"),
        F.col("dec.name").alias("back_name"),
        F.col("dec.nation").alias("back_nation"),
    ).transform(ordered, "key")


# ---------------------------------------------------------------------------
# X183: XML column codec — the BUILT-IN to_xml/from_xml/schema_of_xml
# surface (core Spark 4; unlike avro/protobuf no external module is
# needed), pinned cross-engine by replaying Spark's deterministic
# render (<ROW> + 4-space indent + StAX text escaping of & < > +
# null-field omission) with DuckDB string algebra.

_XML_BACK_SCHEMA = "n LONG, frag STRING, opt STRING"


def _xml_oracle() -> str:
    # & first, then < — the only two characters StAX escapes
    # unconditionally in text content. '>' is escaped ONLY at position 0
    # or after ']]' (probed; pinned by t1 golden strings), so the t2
    # frag stays '>'-free and the replay stays two replace() calls.
    esc = "replace(replace(frag, '&', '&amp;'), '<', '&lt;')"
    esc_opt = "replace(replace(opt, '&', '&amp;'), '<', '&lt;')"
    return f"""
        WITH src AS (
            SELECT doc_id,
                   doc_id % 7 AS n,
                   '&<' || substr(md5(text), 1, 8) || '&' AS frag,
                   CASE WHEN doc_id % 3 = 0 THEN NULL
                        ELSE 'v' || CAST(doc_id AS VARCHAR) END AS opt
            FROM documents)
        SELECT doc_id,
               ('<ROW>' || chr(10) ||
                '    <n>' || CAST(n AS VARCHAR) || '</n>' || chr(10) ||
                '    <frag>' || {esc} || '</frag>' || chr(10) ||
                CASE WHEN opt IS NULL THEN ''
                     ELSE '    <opt>' || {esc_opt} || '</opt>' || chr(10) END ||
                '</ROW>') AS xml,
               n AS back_n, frag AS back_frag, opt AS back_opt
        FROM src
        ORDER BY doc_id
    """


@register(
    "q133_xml_column_codec",
    oracle=_xml_oracle(),
    tags=("codec",),
)
def q133_xml_column_codec(spark: SparkSession, sf: str) -> DataFrame:
    """X183: to_xml/from_xml column codec (built-in StAX path — the
    column-level sibling of the X48 XML source). The rendered document
    is hash-checked against a DuckDB string-algebra replay (4-space
    indent, unconditional &/< escaping with & first, NULL fields
    omitted), so the exact wire text is the contract — not just the
    round trip; back_* pins from_xml∘to_xml == id including the
    null-omission leg. '>' escapes only at position 0 or after ']]'
    (probed) — those contextual rules are pinned by t1 golden strings
    and kept out of the t2 frag. All JVM-side Catalyst expressions,
    zero Python, zero shuffle."""
    t = Tables(spark, sf)
    src = t.documents.select(
        "doc_id",
        (F.col("doc_id") % 7).alias("n"),
        F.concat(
            F.lit("&<"), F.substring(F.md5(F.col("text")), 1, 8), F.lit("&")
        ).alias("frag"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("v"), F.col("doc_id").cast("string")))
        .alias("opt"),
    )
    doc = src.withColumn("xml", F.to_xml(F.struct("n", "frag", "opt")))
    back = doc.withColumn("dec", F.from_xml("xml", _XML_BACK_SCHEMA))
    return back.select(
        "doc_id",
        "xml",
        F.col("dec.n").alias("back_n"),
        F.col("dec.frag").alias("back_frag"),
        F.col("dec.opt").alias("back_opt"),
    ).transform(ordered, "doc_id")


# ---------------------------------------------------------------------------
# X184: CSV column codec — to_csv/from_csv (univocity defaults), the
# last member of the column-codec family (JSON is covered by q54/q30/
# VARIANT; XML/Avro/Protobuf above). Quoting contract probed and
# replayed: a field is quoted iff it contains the delimiter or quote;
# inner quotes are BACKSLASH-escaped (not doubled); SQL NULL renders as
# an EMPTY unquoted field; the empty string renders as "" but decodes
# back as NULL (asymmetry pinned by t1, kept out of the t2 frag).


def _csv_oracle() -> str:
    # frag always contains both ',' and '"' by construction -> always
    # quoted with backslash-escaped inner quotes
    quoted = """'"' || replace(frag, '"', '\\"') || '"'"""
    return f"""
        WITH src AS (
            SELECT doc_id,
                   doc_id % 97 AS n,
                   'x,"' || substr(md5(text), 1, 8) AS frag,
                   CASE WHEN doc_id % 3 = 0 THEN NULL
                        ELSE 'v' || CAST(doc_id AS VARCHAR) END AS opt
            FROM documents)
        SELECT doc_id,
               (CAST(n AS VARCHAR) || ',' || {quoted} || ',' ||
                coalesce(opt, '')) AS csv,
               n AS back_n, frag AS back_frag, opt AS back_opt
        FROM src
        ORDER BY doc_id
    """


@register(
    "q134_csv_column_codec",
    oracle=_csv_oracle(),
    tags=("codec",),
)
def q134_csv_column_codec(spark: SparkSession, sf: str) -> DataFrame:
    """X184: to_csv/from_csv column codec. The rendered line is the
    hash-checked contract (DuckDB replays the univocity quoting rules
    with string algebra) and back_* pins from_csv∘to_csv == id on
    non-empty strings (the empty-string→NULL decode asymmetry is a t1
    pin). All JVM-side, zero Python, zero shuffle."""
    t = Tables(spark, sf)
    src = t.documents.select(
        "doc_id",
        (F.col("doc_id") % 97).alias("n"),
        F.concat(F.lit('x,"'), F.substring(F.md5(F.col("text")), 1, 8)).alias("frag"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("v"), F.col("doc_id").cast("string")))
        .alias("opt"),
    )
    doc = src.withColumn("csv", F.to_csv(F.struct("n", "frag", "opt")))
    back = doc.withColumn("dec", F.from_csv("csv", "n LONG, frag STRING, opt STRING"))
    return back.select(
        "doc_id",
        "csv",
        F.col("dec.n").alias("back_n"),
        F.col("dec.frag").alias("back_frag"),
        F.col("dec.opt").alias("back_opt"),
    ).transform(ordered, "doc_id")


# ---------------------------------------------------------------------------
# X187: the event-bus INGEST composition over X182 — binary payloads
# arrive, some corrupt; PERMISSIVE decode + dead-letter split with raw
# evidence (the protobuf sibling of X68's corrupt-JSON quarantine).

_EVT_FIELDS = [("event_id", 1, "sint64"), ("user_id", 2, "sint64"), ("etype", 3, "string")]
_EVT_DESC = codecs.build_file_descriptor_set("Evt", _EVT_FIELDS)


def _pb_ingest_oracle() -> str:
    # the corrupt payload is its own leading tag byte: field 1 unless
    # event_id is at the proto3 default (omitted), then field 2, then 3
    lead_tag = (
        "CASE WHEN event_id <> 0 THEN '08' "
        "WHEN user_id <> 0 THEN '10' ELSE '1A' END"
    )
    return f"""
        SELECT event_id AS src_id,
               CASE WHEN event_id % 13 = 0 THEN 'quarantined' ELSE 'kept' END AS status,
               CASE WHEN event_id % 13 = 0 THEN NULL ELSE user_id END AS back_user,
               CASE WHEN event_id % 13 = 0 THEN NULL ELSE event_type END AS back_etype,
               CASE WHEN event_id % 13 = 0 THEN {lead_tag} END AS raw_hex
        FROM events
        ORDER BY src_id
    """


@register(
    "p_protobuf_ingest_quarantine",
    oracle=_pb_ingest_oracle(),
    tags=("codec", "pipeline", "udf", "large-output"),
)
def p_protobuf_ingest_quarantine(spark: SparkSession, sf: str) -> DataFrame:
    """X187: kafka-shaped protobuf ingest — encode events to wire bytes,
    deterministically corrupt every 13th payload to its first byte (a
    dangling tag: reliably malformed), decode PERMISSIVE, and split on
    DECODE SUCCESS (etype is never empty for well-formed rows, so an
    all-NULL struct marks failure). Quarantined rows keep the raw
    payload hex as evidence (X68's dead-letter contract). The oracle
    derives the split from the corruption RULE, so the hash match
    proves the decoder failed on exactly the corrupted rows and
    recovered every healthy one — the 100 TB property that one bad
    record never kills the job and none is silently dropped."""
    t = Tables(spark, sf)
    src = t.events.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_type").alias("etype"),
    )
    enc = src.withColumn(
        "payload",
        codecs.to_protobuf(F.struct("event_id", "user_id", "etype"), "Evt", _EVT_DESC),
    )
    wire = enc.withColumn(
        "payload",
        F.when(
            F.col("event_id") % 13 == 0, F.expr("substring(payload, 1, 1)")
        ).otherwise(F.col("payload")),
    )
    dec = wire.withColumn("dec", codecs.from_protobuf("payload", "Evt", _EVT_DESC))
    return dec.select(
        F.col("event_id").alias("src_id"),
        F.when(F.col("dec.etype").isNull(), F.lit("quarantined"))
        .otherwise(F.lit("kept"))
        .alias("status"),
        F.col("dec.user_id").alias("back_user"),
        F.col("dec.etype").alias("back_etype"),
        F.when(F.col("dec.etype").isNull(), F.hex("payload")).alias("raw_hex"),
    )  # one row per event: large-output, unsorted by design
