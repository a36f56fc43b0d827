"""Round-13 behavioral pins.

Covers the r12 ADVICE fixes (truncated-WAV NULL rows, sfl legacy
epoch-key replay detection), the mm_feature_extract
driver-canonicalizer-safe output form, and the round's new operators.
"""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# r12 ADVICE #1: truncated 16-bit PCM blobs must yield NULL rows, not a
# struct.error that kills the mapInPandas task


def _wav_bytes(samples, nch=1, rate=8000):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(nch)
    w.setsampwidth(2)
    w.setframerate(rate)
    w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    w.close()
    return buf.getvalue()


def test_truncated_wav_yields_null_row_not_task_failure(spark):
    """A WAV whose data chunk is cut mid-sample (odd byte count — the
    header promises more frames than the blob holds) previously raised
    struct.error OUTSIDE the decoder's try/except and failed the whole
    task; the contract is a NULL stats row with the pipeline flowing."""
    from sparkflow_spark import multimodal

    good = _wav_bytes([100, -100, 200, -200])
    # chop one byte: the data chunk now ends mid-sample (odd length)
    odd_truncated = good[:-1]
    # chop a whole sample: even length but short of the header's count
    short_even = good[:-2]
    assert multimodal.decode_wav_bytes(odd_truncated) is None
    assert multimodal.decode_wav_bytes(short_even) is None
    assert multimodal.decode_wav_bytes(good) is not None

    rows = [(0, good), (1, odd_truncated), (2, short_even)]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r["doc_id"]: r for r in multimodal.decode_audio(df).collect()}
    assert len(got) == 3  # every blob produced a row — no dead task
    assert got[0]["sum_sq"] == sum(s * s for s in [100, -100, 200, -200])
    for bad in (1, 2):
        assert got[bad]["n_channels"] is None
        assert got[bad]["sum_sq"] is None and got[bad]["peak"] is None


# ---------------------------------------------------------------------------
# r12 ADVICE #2: sfl stream-writer manifests written BEFORE epochs were
# keyed per checkpoint hold bare str(batchId) keys — a post-upgrade
# replay of such an epoch must still be detected (no double-append)


def test_sfl_stream_writer_detects_legacy_bare_batchid_epochs(tmp_path):
    from pyspark.sql.types import LongType, StructField, StructType

    from sparkflow_spark.sources_python import (
        SflStreamWriter,
        _SflCommit,
        _manifest_path,
        _read_manifest,
    )

    sink = str(tmp_path / "sink")
    os.makedirs(sink)
    # a manifest as the PRE-upgrade code wrote it: epoch keyed by bare
    # batchId, one committed shard
    legacy = {
        "schema": "id bigint",
        "shards": [{"file": "shard-legacy.sfl", "rows": 2}],
        "epochs": {"7": ["shard-legacy.sfl"]},
    }
    with open(_manifest_path(sink), "w") as fh:
        json.dump(legacy, fh)
    with open(os.path.join(sink, "shard-legacy.sfl"), "w") as fh:
        fh.write("1\n2\n")

    schema = StructType([StructField("id", LongType())])
    writer = SflStreamWriter(sink, schema, query_key="ck-after-upgrade")
    # the replayed epoch's duplicate task output, already on disk
    dup = os.path.join(sink, "shard-dup.sfl")
    with open(dup, "w") as fh:
        fh.write("1\n2\n")
    writer.commit([_SflCommit("shard-dup.sfl", 2)], batchId=7)

    m = _read_manifest(sink)
    # replay detected via the legacy key: manifest unchanged, duplicate
    # shard discarded from disk
    assert [s["file"] for s in m["shards"]] == ["shard-legacy.sfl"]
    assert set(m["epochs"]) == {"7"}
    assert not os.path.exists(dup)

    # a genuinely NEW epoch still appends under the per-checkpoint key
    new = os.path.join(sink, "shard-new.sfl")
    with open(new, "w") as fh:
        fh.write("3\n")
    writer.commit([_SflCommit("shard-new.sfl", 1)], batchId=8)
    m = _read_manifest(sink)
    assert [s["file"] for s in m["shards"]] == ["shard-legacy.sfl", "shard-new.sfl"]
    assert set(m["epochs"]) == {"7", "ck-after-upgrade:8"}


# ---------------------------------------------------------------------------
# r12 verdict ask #2: mm_feature_extract's registered output must be
# driver-canonicalizer-safe (no ArrayType final column)


def test_mm_feature_extract_output_is_canonicalizer_safe(spark, sf_dir):
    from sparkflow_spark.queries import load_all

    df = load_all()["mm_feature_extract"].fn(spark, sf_dir)
    kinds = {f.name: f.dataType.typeName() for f in df.schema.fields}
    assert kinds == {"doc_id": "long", "features_csv": "string"}
    # the driver's canonicalization path (pandas sort + hash) must work
    pdf = df.limit(8).toPandas()
    canon = pdf[sorted(pdf.columns)].astype(str)
    canon.sort_values(by=list(canon.columns)).reset_index(drop=True)
    # and the CSV form is lossless back to the 8-dim vector
    vec = [float(x) for x in pdf["features_csv"].iloc[0].split(",")]
    assert len(vec) == 8 and abs(sum(vec) - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# X181/X182: Avro + Protobuf column codecs — golden wire pins (spec
# values, python level) and malformed-payload mode legs (Spark level)


def _avro_fields(schema):
    from sparkflow_spark.codecs import _parse_avro_schema

    return _parse_avro_schema(schema)


def test_avro_golden_wire_pins():
    """Byte-exact pins from the public Avro spec's binary-encoding
    section: zigzag varints (longs AND length prefixes AND union
    indexes), little-endian doubles, block-encoded arrays."""
    import json

    from sparkflow_spark.codecs import decode_avro_record, encode_avro_record

    sch = json.dumps(
        {
            "type": "record",
            "name": "G",
            "fields": [
                {"name": "a", "type": "long"},
                {"name": "b", "type": "string"},
                {"name": "c", "type": ["null", "string"]},
                {"name": "d", "type": "double"},
                {"name": "e", "type": "boolean"},
                {"name": "f", "type": "bytes"},
                {"name": "g", "type": {"type": "array", "items": "long"}},
            ],
        }
    )
    flds = _avro_fields(sch)
    enc = encode_avro_record(
        {"a": 1, "b": "foo", "c": None, "d": 1.0, "e": True, "f": b"\x00\xff", "g": [3, 27]},
        flds,
    )
    assert enc == bytes.fromhex(
        "02"          # a: zigzag(1)=2
        "06666f6f"    # b: len 3 -> zigzag 6, 'foo'
        "00"          # c: union branch 0 = null
        "000000000000f03f"  # d: 1.0 little-endian IEEE754
        "01"          # e: true
        "0400ff"      # f: len 2 -> zigzag 4
        "040636 00".replace(" ", "")  # g: count 2, items 3->06 27->36, end 00
    )
    assert decode_avro_record(enc, flds) == {
        "a": 1, "b": "foo", "c": None, "d": 1.0, "e": True,
        "f": b"\x00\xff", "g": [3, 27],
    }
    # negative / multi-byte varint legs + int64 extremes round-trip
    enc2 = encode_avro_record(
        {"a": -1, "b": "", "c": "a", "d": -0.0, "e": False, "f": b"", "g": []},
        flds,
    )
    assert enc2.startswith(bytes.fromhex("01" "00" "02" "02" "61"))
    assert enc2.endswith(bytes.fromhex("00"))  # empty array = end marker only
    for extreme in (2**63 - 1, -(2**63), 64, -64, 8192):
        e = encode_avro_record(
            {"a": extreme, "b": "x", "c": None, "d": 0.0, "e": False, "f": b"", "g": []},
            flds,
        )
        assert decode_avro_record(e, flds)["a"] == extreme
    # zigzag(64) = 128 -> two-byte varint 80 01
    e64 = encode_avro_record(
        {"a": 64, "b": "", "c": None, "d": 0.0, "e": False, "f": b"", "g": []}, flds
    )
    assert e64.startswith(bytes.fromhex("8001"))


def test_avro_malformed_payload_detection():
    import json

    from sparkflow_spark.codecs import (
        MalformedPayload,
        decode_avro_record,
        encode_avro_record,
    )

    sch = json.dumps(
        {"type": "record", "name": "G",
         "fields": [{"name": "a", "type": "long"}, {"name": "b", "type": "string"}]}
    )
    flds = _avro_fields(sch)
    good = encode_avro_record({"a": 7, "b": "hi"}, flds)
    for bad in (
        good[:-1],            # truncated string body
        good + b"\x00",       # trailing bytes
        b"\x80",              # varint runs past end
        b"\x02\x07zzzzzzz"[:3],  # truncated length-prefixed body
    ):
        with pytest.raises(MalformedPayload):
            decode_avro_record(bad, flds)
    with pytest.raises(MalformedPayload, match="non-nullable"):
        encode_avro_record({"a": None, "b": "x"}, flds)


def test_protobuf_golden_wire_and_descriptor_set():
    """The spec's canonical examples through a REAL FileDescriptorSet:
    int64 150 -> 08 96 01; sint64 -2 -> zigzag 3; proto3 default skip;
    unknown fields skipped on decode."""
    from sparkflow_spark import minipb
    from sparkflow_spark.codecs import _resolve_message, build_file_descriptor_set

    desc = build_file_descriptor_set(
        "T",
        [("i", 1, "int64"), ("s", 2, "string"), ("z", 3, "sint64")],
    )
    # the descriptor set itself parses with the repo's own runtime
    cls, flds = _resolve_message(desc, "T")
    assert [n for n, _ in flds] == ["i", "s", "z"]

    m = cls()
    m.i = 150
    assert m.SerializeToString() == bytes.fromhex("089601")
    m2 = cls()
    m2.s = "testing"
    assert m2.SerializeToString() == bytes.fromhex("120774657374696e67")
    m3 = cls()
    m3.z = -2
    assert m3.SerializeToString() == bytes.fromhex("1803")
    # proto3 implicit presence: defaults emit nothing
    m4 = cls()
    m4.i = 0
    m4.s = ""
    assert m4.SerializeToString() == b""
    # unknown field (99, varint) skipped on decode
    buf = bytearray()
    minipb.write_tag(buf, 99, 0)
    minipb.write_varint(buf, 5)
    m5 = cls()
    m5.ParseFromString(bytes(buf) + bytes.fromhex("089601"))
    assert m5.i == 150
    # unknown message name is a plan-time error
    with pytest.raises(ValueError, match="not found"):
        _resolve_message(desc, "Nope")


def test_codec_columns_permissive_and_failfast(spark):
    """The Spark column API end to end: encode -> corrupt some payloads
    -> PERMISSIVE yields NULL rows while good rows decode; FAILFAST
    raises. Covers both codecs through the Arrow pandas_udf lane."""
    import json

    from sparkflow_spark import codecs

    sch = json.dumps(
        {"type": "record", "name": "R",
         "fields": [{"name": "k", "type": "long"}, {"name": "t", "type": "string"}]}
    )
    desc = codecs.build_file_descriptor_set("R", [("k", 1, "sint64"), ("t", 2, "string")])
    df = spark.range(6).selectExpr(
        "id AS k", "concat('v', CAST(id AS STRING)) AS t"
    )
    enc = df.select(
        "k",
        codecs.to_avro(F.struct("k", "t"), sch).alias("a"),
        codecs.to_protobuf(F.struct("k", "t"), "R", desc).alias("p"),
    )
    # corrupt payloads on odd keys (chop to 1 byte — truncated for avro,
    # a dangling tag for protobuf)
    corrupt = enc.select(
        "k",
        F.when(F.col("k") % 2 == 1, F.expr("substring(a, 1, 1)")).otherwise(F.col("a")).alias("a"),
        F.when(F.col("k") % 2 == 1, F.expr("X'08'")).otherwise(F.col("p")).alias("p"),
    )
    got = corrupt.select(
        "k",
        codecs.from_avro("a", sch).alias("da"),
        codecs.from_protobuf("p", "R", desc).alias("dp"),
    ).collect()
    for r in sorted(got, key=lambda r: r["k"]):
        if r["k"] % 2 == 1:
            assert r["da"]["k"] is None and r["da"]["t"] is None
            assert r["dp"]["k"] is None and r["dp"]["t"] is None
        else:
            assert r["da"]["k"] == r["k"] and r["da"]["t"] == f"v{r['k']}"
            assert r["dp"]["k"] == r["k"] and r["dp"]["t"] == f"v{r['k']}"
    # FAILFAST raises through the task
    with pytest.raises(Exception, match="(?i)malformed|trailing|past end|undecodable"):
        corrupt.select(
            codecs.from_avro("a", sch, {"mode": "FAILFAST"}).alias("d")
        ).collect()
    with pytest.raises(Exception, match="(?i)malformed|undecodable"):
        corrupt.select(
            codecs.from_protobuf("p", "R", desc, {"mode": "FAILFAST"}).alias("d")
        ).collect()


def test_xml_codec_escaping_rules_and_malformed(spark):
    """X183 t1: the StAX text-escaping contract behind the q133 oracle —
    & and < escape unconditionally; > escapes ONLY at position 0 or
    after ']]' (probed rules, golden-pinned here so an upstream StAX
    change breaks THIS test, not the t2 silently); from_xml on
    malformed input yields a NULL struct (PERMISSIVE default)."""
    cases = {
        "a>b": "a>b",          # interior > unescaped
        ">x": "&gt;x",         # position 0
        "]]>": "]]&gt;",       # after ]]
        "a]]>b": "a]]&gt;b",
        "<>": "&lt;>",         # > after < (original) stays raw
        "&<": "&amp;&lt;",     # unconditional pair
        '"q"': '"q"',          # quotes untouched in text content
    }
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], "i long, s string"
    )
    got = {
        r["i"]: r["x"]
        for r in df.select("i", F.to_xml(F.struct("s")).alias("x")).collect()
    }
    for i, (src, want) in enumerate(cases.items()):
        assert got[i] == f"<ROW>\n    <s>{want}</s>\n</ROW>", (src, got[i])
    # malformed XML -> NULL struct row, pipeline flows
    bad = spark.createDataFrame([("<ROW><a>1</a",), ("not xml",)], "x string")
    rows = bad.select(F.from_xml("x", "a LONG").alias("r")).collect()
    assert all(r["r"]["a"] is None for r in rows)


def test_csv_codec_quoting_rules_and_asymmetries(spark):
    """X184 t1: univocity default rendering pinned — quote iff the
    value holds delimiter/quote, inner quotes BACKSLASH-escaped, empty
    string renders '\"\"' but decodes back NULL, SQL NULL renders bare
    empty; a raw newline inside an unquoted value does not survive
    to_csv (single-line record) — all probed, golden-pinned so an
    upstream univocity change fails here, not in the t2."""
    cases = {
        0: ("plain", "plain"),
        1: ("a,b", '"a,b"'),
        2: ('q"x', '"q\\"x"'),
        3: ('both,"y', '"both,\\"y"'),
        4: ("", '""'),
        5: (None, ""),
        6: ("sp ace", "sp ace"),
    }
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in cases.items()], "i long, s string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", F.to_csv(F.struct("i", "s")).alias("c")).collect()
    }
    for i, (_, want) in cases.items():
        assert got[i] == f"{i},{want}", (i, got[i])
    back = (
        df.select("i", F.to_csv(F.struct("i", "s")).alias("c"))
        .select("i", F.from_csv("c", "i LONG, s STRING").alias("r"))
        .collect()
    )
    decoded = {r["i"]: r["r"]["s"] for r in back}
    assert decoded[0] == "plain" and decoded[2] == 'q"x'
    assert decoded[4] is None  # "" -> NULL: the pinned decode asymmetry
    assert decoded[5] is None
    # newline data loss on the encode side (single-line record)
    nl = spark.createDataFrame([("\nnl",)], "s string")
    assert nl.select(F.to_csv(F.struct("s")).alias("c")).first()["c"] == "nl"


# ---------------------------------------------------------------------------
# X188 bitmap family: OR-merged bitmaps count exactly what direct
# construction counts, on a frame with a KNOWN distinct answer.


def test_bitmap_merge_equals_direct_known_counts(spark):
    rows = [(g, s, k) for g in ("a", "b") for s in ("x", "y") for k in (1, 2, 3, 40000)]
    rows.append(("a", "x", 1))  # duplicate: must not double-count
    df = spark.createDataFrame(rows, "g string, s string, k long")
    fine = df.groupBy(
        "g", "s", F.bitmap_bucket_number("k").alias("b")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("k")).alias("bm"))
    merged = (
        fine.groupBy("g", "b")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .groupBy("g")
        .agg(F.sum(F.bitmap_count("bm")).alias("n"))
    )
    got = {r["g"]: r["n"] for r in merged.collect()}
    # k=40000 crosses into bucket 2 (32768 positions/bucket) — the
    # multi-bucket leg is live
    assert got == {"a": 4, "b": 4}


# X189: month-end clamping parity legs the entry exercises on real dates.


def test_interval_month_end_clamps(spark):
    df = spark.createDataFrame(
        [("1995-01-31",), ("1996-01-31",), ("1995-03-31",)], "d string"
    ).select(F.col("d").cast("timestamp").alias("ts"))
    got = [
        str(r["m1"])[:10]
        for r in df.select(
            (F.col("ts") + F.expr("INTERVAL '1' MONTH")).alias("m1")
        ).collect()
    ]
    assert got == ["1995-02-28", "1996-02-29", "1995-04-30"]


# X190: map HOF algebra on a golden frame.


def test_map_hof_golden(spark):
    df = spark.createDataFrame(
        [({"a": 1, "b": 3},)], "m map<string,long>"
    )
    row = df.select(
        F.transform_values("m", lambda k, v: v * 10).alias("t"),
        F.map_filter("m", lambda k, v: v >= 2).alias("f"),
        F.map_zip_with(
            "m", F.create_map(F.lit("a"), F.lit(2), F.lit("b"), F.lit(4)),
            lambda k, x, y: x + y,
        ).alias("z"),
        F.aggregate(
            F.map_values("m"), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("s"),
    ).first()
    assert row["t"] == {"a": 10, "b": 30}
    assert row["f"] == {"b": 3}
    assert row["z"] == {"a": 3, "b": 7}
    assert row["s"] == 4


# X191: posexplode_outer's null leg and sequence's closed-form sum.


def test_generators_outer_null_leg(spark):
    df = spark.createDataFrame([(1, ["x", "y"]), (2, None)], "k long, l array<string>")
    got = sorted(
        (r["k"], r["pos"], r["part"])
        for r in df.select("k", F.posexplode_outer("l").alias("pos", "part")).collect()
    )
    assert got == [(1, 0, "x"), (1, 1, "y"), (2, None, None)]
    s = (
        spark.range(1, 8)
        .select(
            F.aggregate(
                F.sequence(F.lit(1).cast("long"), F.col("id")),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            ).alias("s"),
            (F.col("id") * (F.col("id") + 1) / 2).cast("long").alias("want"),
        )
        .filter(F.col("s") != F.col("want"))
        .count()
    )
    assert s == 0


# X192: the truncated metric must IGNORE dims 17..64 — two corpus
# vectors identical in the prefix but opposite in the tail rank equally
# under t16 and differently under the full cosine.


def test_matryoshka_prefix_blindness(spark):
    from sparkflow_spark.functions.vector import dot, l2_norm

    probe = [1.0] * 16 + [1.0] * 48
    same_tail = [1.0] * 16 + [1.0] * 48
    flip_tail = [1.0] * 16 + [-1.0] * 48
    df = spark.createDataFrame(
        [(1, same_tail), (2, flip_tail)], "vec_id long, embedding array<float>"
    ).withColumn("p", F.lit(probe).cast("array<float>"))
    r = df.select(
        "vec_id",
        (dot(F.slice("p", 1, 16), F.slice("embedding", 1, 16))
         / (l2_norm(F.slice("p", 1, 16)) * l2_norm(F.slice("embedding", 1, 16)))
         ).alias("t16"),
        (dot("p", "embedding") / (l2_norm("p") * l2_norm("embedding"))).alias("full"),
    ).collect()
    by_id = {x["vec_id"]: x for x in r}
    assert by_id[1]["t16"] == by_id[2]["t16"] == pytest.approx(1.0)
    assert by_id[1]["full"] == pytest.approx(1.0)
    assert by_id[2]["full"] == pytest.approx(-0.5)  # (16-48)/(8*8)


# X193: the ROWS form is exact even when it exceeds the table.


def test_tablesample_rows_exact(spark):
    spark.range(0, 37).createOrReplaceTempView("_ts37")
    n = spark.sql("SELECT COUNT(*) AS n FROM _ts37 TABLESAMPLE (200 ROWS)").first()["n"]
    assert n == 37
    n = spark.sql("SELECT COUNT(*) AS n FROM _ts37 TABLESAMPLE (5 ROWS)").first()["n"]
    assert n == 5


# X194: untagged documents keep an empty-topics row.


def test_keyword_tags_untagged_doc_kept(spark, tmp_path):
    import pyspark.sql.functions as SF

    docs = spark.createDataFrame(
        [(1, "scan the stream"), (2, "nothing relevant here")],
        "doc_id long, text string",
    )
    d = str(tmp_path / "kw")
    docs.write.parquet(f"{d}/documents.parquet")
    from sparkflow_spark.queries import load_all, REGISTRY

    load_all()
    out = {
        r["doc_id"]: (r["topics"], r["n_topics"])
        for r in REGISTRY["t_keyword_topic_tags"].fn(spark, d).collect()
    }
    assert out[1] == ("exec,streaming", 2)
    assert out[2] == ("", 0)


# X195: parse_url edge goldens — port stripped from HOST, absent query
# -> NULL (not ''), fragment extraction.


def test_parse_url_edge_goldens(spark):
    urls = [
        ("https://h.example.com:8443/a/doc-2?ref=x&page=4#top",),
        ("https://h.example.com/b/doc-5",),
    ]
    df = spark.createDataFrame(urls, "u string")
    rows = df.select(
        F.parse_url("u", F.lit("HOST")).alias("host"),
        F.parse_url("u", F.lit("QUERY")).alias("q"),
        F.parse_url("u", F.lit("QUERY"), F.lit("page")).alias("page"),
        F.parse_url("u", F.lit("REF")).alias("ref"),
    ).collect()
    assert rows[0]["host"] == "h.example.com"  # port stripped
    assert rows[0]["page"] == "4" and rows[0]["ref"] == "top"
    assert rows[1]["q"] is None and rows[1]["page"] is None and rows[1]["ref"] is None


# X196: the all-zero id leg — regexp_substr('[1-9][0-9]*') alone would
# return NULL for Customer#000000000; the '|0$' alternative pins '0'.


def test_regexp_substr_zero_id_leg(spark):
    df = spark.createDataFrame(
        [("Customer#000000000",), ("Customer#000000123",)], "c_name string"
    )
    got = [
        r["s"]
        for r in df.select(
            F.regexp_substr(F.col("c_name"), F.lit("[1-9][0-9]*|0$")).alias("s")
        ).collect()
    ]
    assert got == ["0", "123"]


# X197: observed metrics equal a direct aggregation of the same frame.


def test_observe_equals_direct_agg(spark):
    from pyspark.sql import Observation

    df = spark.range(0, 100).withColumn("v", (F.col("id") * 2).cast("double"))
    obs = Observation("t13")
    observed = df.observe(
        obs, F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"),
        F.max("v").alias("mx")
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    assert (m["n"], m["s"], m["mx"]) == (100, 4950, 198.0)


# ---------------------------------------------------------------------------
# X200: ANALYZE TABLE + CBO — the statistics surface that decides join
# strategies at 100 TB. Without column stats Spark sizes a FILTERED
# relation by its file footprint (filter ignored) and plans a
# sort-merge join; with ANALYZE ... FOR ALL COLUMNS + spark.sql.cbo the
# filter's selectivity shrinks the estimate under the broadcast
# threshold and the SAME query plans a broadcast hash join.


def test_analyze_stats_flip_join_to_broadcast(spark):
    spark.sql("DROP TABLE IF EXISTS r13_dim")
    spark.sql("DROP TABLE IF EXISTS r13_fact")
    try:
        spark.range(0, 400_000).selectExpr(
            "id AS k", "CAST(id % 97 AS LONG) AS grp"
        ).write.saveAsTable("r13_dim")
        spark.range(0, 400_000).selectExpr(
            "id % 400000 AS k", "id AS v"
        ).write.saveAsTable("r13_fact")
        q = """
            SELECT f.v, d.grp FROM r13_fact f
            JOIN r13_dim d ON f.k = d.k WHERE d.grp = 3
        """
        conf = {
            "spark.sql.cbo.enabled": "true",
            "spark.sql.cbo.joinReorder.enabled": "true",
            "spark.sql.autoBroadcastJoinThreshold": str(256 * 1024),
            "spark.sql.adaptive.enabled": "false",
        }
        saved = {k: spark.conf.get(k, None) for k in conf}
        try:
            for k, v in conf.items():
                spark.conf.set(k, v)
            before = spark.sql(q)._jdf.queryExecution().executedPlan().toString()
            # both scans' file footprints exceed the threshold and the
            # filter is not costed without column stats -> no broadcast
            assert "BroadcastHashJoin" not in before, before[:800]
            spark.sql(
                "ANALYZE TABLE r13_dim COMPUTE STATISTICS FOR ALL COLUMNS"
            )
            spark.sql("ANALYZE TABLE r13_fact COMPUTE STATISTICS")
            after = spark.sql(q)._jdf.queryExecution().executedPlan().toString()
            # grp=3 keeps ~1/97 of rows; CBO's filter estimation sinks
            # the relation under the threshold -> broadcast
            assert "BroadcastHashJoin" in after, after[:800]
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
    finally:
        spark.sql("DROP TABLE IF EXISTS r13_dim")
        spark.sql("DROP TABLE IF EXISTS r13_fact")


# X198: the sketch-merge lifecycle equals the one-shot sketch on the
# same data (combine is associative addition).


def test_approx_topk_combine_equals_oneshot(spark):
    df = spark.createDataFrame(
        [(i % 3, "abcde"[i % 5]) for i in range(200)], "part int, v string"
    )
    df.createOrReplaceTempView("r13_atk")
    merged = spark.sql(
        """
        WITH per AS (SELECT part, approx_top_k_accumulate(v, 10) AS sk
                     FROM r13_atk GROUP BY part)
        SELECT approx_top_k_estimate(approx_top_k_combine(sk, 10), 5) AS e FROM per
        """
    ).first()["e"]
    oneshot = spark.sql(
        "SELECT approx_top_k_estimate(approx_top_k_accumulate(v, 10), 5) AS e FROM r13_atk"
    ).first()["e"]
    assert sorted((r["item"], r["count"]) for r in merged) == sorted(
        (r["item"], r["count"]) for r in oneshot
    )


# X199: StringIndexer's documented tie rule — equal frequencies sort
# alphabetically under frequencyDesc.


def test_string_indexer_tie_rule(spark):
    from pyspark.ml.feature import StringIndexer

    df = spark.createDataFrame(
        [("b",), ("b",), ("a",), ("a",), ("c",)], "s string"
    )
    m = StringIndexer(inputCol="s", outputCol="i").fit(df)
    assert m.labels == ["a", "b", "c"]  # a/b tie at 2 -> alphabetical, c last
