"""Sources/sinks + composite operators: partition pruning evidence,
bucketed shuffle-free joins, salted-join equivalence, asof/pivot/top-k
unit behavior, plus hypothesis property tests for the function library."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings, strategies as st

from sparkflow_spark import operators, sources
from sparkflow_spark.catalog import Tables


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    t = Tables(spark, sf_dir)
    out = str(tmp_path / "orders_by_year")
    df = t.orders.withColumn("yr", F.year("o_orderdate"))
    sources.write_partitioned(df, out, ["yr"])
    back = sources.read_parquet(spark, out)
    assert back.count() == t.orders.count()
    pruned = back.filter(F.col("yr") == 1995)
    plan = _plan(pruned)
    assert "PartitionFilters" in plan and "yr" in plan.split("PartitionFilters", 1)[1][:200]
    assert pruned.count() == df.filter(F.col("yr") == 1995).count()


def test_bucketed_join_skips_shuffle(spark, sf_dir, tmp_path):
    """Both sides bucketed on the join key → SortMergeJoin with NO
    Exchange (the pay-once pre-shuffle strategy, see sources module)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try:
        t = Tables(spark, sf_dir)
        sources.write_bucketed(t.orders, "b_orders", ["o_custkey"], 4)
        sources.write_bucketed(
            t.customer.withColumnRenamed("c_custkey", "o_custkey"), "b_customer", ["o_custkey"], 4
        )
        joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, "bucketed join should not shuffle"
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_salted_join_equals_plain_join(spark):
    # skewed big side: one hot key
    big = spark.createDataFrame(
        [(1, i) for i in range(5000)] + [(k, k) for k in range(2, 50)], ["k", "v"]
    )
    small = spark.createDataFrame([(k, f"dim{k}") for k in range(0, 50)], ["k", "name"])
    plain = {(r["k"], r["v"], r["name"]) for r in big.join(small, "k").collect()}
    salted = {
        (r["k"], r["v"], r["name"])
        for r in operators.salted_join(big, small, "k", salt=8).collect()
    }
    assert salted == plain


def test_asof_join_semantics(spark):
    quotes = spark.createDataFrame(
        [("A", 1, 10.0), ("A", 5, 11.0), ("B", 3, 20.0)], ["sym", "t", "px"]
    )
    trades = spark.createDataFrame(
        [("A", 0), ("A", 1), ("A", 6), ("B", 2), ("B", 9)], ["sym", "t"]
    )
    got = {
        (r["sym"], r["t"]): r["px_asof"]
        for r in operators.asof_join(
            trades, quotes, on="t", by=["sym"], value_cols=["px"]
        ).collect()
    }
    assert got == {
        ("A", 0): None,   # before any quote
        ("A", 1): 10.0,   # tie → right row matches (<= semantics)
        ("A", 6): 11.0,
        ("B", 2): None,
        ("B", 9): 20.0,
    }


def test_top_k_per_group(spark, sf_dir):
    t = Tables(spark, sf_dir)
    top = operators.top_k_per_group(
        t.orders, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey")], 2
    )
    counts = top.groupBy("o_custkey").count().agg(F.max("count")).first()[0]
    assert counts <= 2


# ---------------------------------------------------------------------------
# Property-based: function library vs numpy/python oracles
# ---------------------------------------------------------------------------

finite_floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=32
)


@settings(max_examples=20, deadline=None)
@given(st.lists(finite_floats, min_size=1, max_size=16))
def test_prop_l2_norm_matches_numpy(xs):
    spark = _prop_spark()
    from sparkflow_spark.functions.vector import l2_norm

    row = spark.createDataFrame([(xs,)], "a: array<double>").select(l2_norm("a")).first()
    assert row[0] == pytest.approx(float(np.linalg.norm(np.array(xs))), rel=1e-9, abs=1e-9)


@settings(max_examples=20, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=200))
def test_prop_token_count_matches_python(text):
    # printable ASCII only: Java's \s and python's str.split() disagree
    # on exotic Unicode whitespace (e.g. U+00A0)
    spark = _prop_spark()
    from sparkflow_spark.functions.text import token_count

    got = spark.createDataFrame([(text,)], "t: string").select(token_count("t")).first()[0]
    assert got == len(text.split())


_PROP_SPARK = None


def _prop_spark():
    global _PROP_SPARK
    if _PROP_SPARK is None:
        from sparkflow_spark.session import build_session

        _PROP_SPARK = build_session(app_name="prop_tests", master="local[2]")
    return _PROP_SPARK


def test_connected_components_vs_union_find(spark):
    from sparkflow_spark.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (10, 1), (7, 8), (8, 9), (9, 7)], ["id_a", "id_b"]
    )
    comp = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    # python union-find oracle
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in [(1, 2), (2, 3), (5, 6), (10, 1), (7, 8), (8, 9), (9, 7)]:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups = {}
    for n in parent:
        groups.setdefault(find(n), set()).add(n)
    expected = {n: min(g) for g in groups.values() for n in g}
    assert comp == expected


def test_csv_json_readers_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], ["id", "s", "v"])
    csv_path = str(tmp_path / "csv")
    json_path = str(tmp_path / "json")
    df.coalesce(1).write.option("header", "true").csv(csv_path)
    df.coalesce(1).write.json(json_path)

    back_schema = sources.read_csv(spark, csv_path, schema="id int, s string, v double")
    assert {tuple(r) for r in back_schema.collect()} == {(1, "a", 1.5), (2, "b", 2.5)}
    back_infer = sources.read_csv(spark, csv_path, infer_schema=True)
    assert back_infer.count() == 2 and dict(back_infer.dtypes)["id"] == "int"
    back_json = sources.read_json(spark, json_path, schema="id long, s string, v double")
    assert {tuple(r) for r in back_json.collect()} == {(1, "a", 1.5), (2, "b", 2.5)}


def test_char_ngrams(spark):
    from sparkflow_spark.functions.text import char_ngrams

    df = spark.createDataFrame([("Hello",), ("ab",)], ["t"])
    rows = df.select(char_ngrams("t", n=3).alias("g")).collect()
    assert rows[0]["g"] == ["hel", "ell", "llo"]
    assert rows[1]["g"] == ["ab"]  # shorter than n → whole string

def test_salted_join_rejects_unsupported_how(spark):
    """Replicating the small side salt-times breaks right/full-outer and
    semi/anti joins — salted_join must refuse them (r2 verdict #4)."""
    import pytest

    big = spark.createDataFrame([(1, 1)], ["k", "v"])
    small = spark.createDataFrame([(1, "d")], ["k", "name"])
    for how in ("right", "full", "left_semi", "left_anti", "outer"):
        with pytest.raises(ValueError, match="salted_join"):
            operators.salted_join(big, small, "k", how=how)

def test_orc_text_binary_sources_roundtrip(spark, tmp_path):
    """ORC writer/reader roundtrip, line-text ingest, and the binaryFile
    multimodal ingest path (path/length metadata + raw bytes)."""
    from sparkflow_spark import sources

    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", -2.0)], "id int, s string, v double")
    orc_path = str(tmp_path / "orc")
    sources.write_orc(df, orc_path)
    back = sources.read_orc(spark, orc_path)
    assert {tuple(r) for r in back.collect()} == {(1, "a", 1.5), (2, "b", -2.0)}

    txt_dir = tmp_path / "docs"
    txt_dir.mkdir()
    (txt_dir / "a.txt").write_text("doc one\ndoc two\n")
    lines = sources.read_text(spark, str(txt_dir))
    assert sorted(r["value"] for r in lines.collect()) == ["doc one", "doc two"]
    whole = sources.read_text(spark, str(txt_dir), whole_text=True)
    assert whole.count() == 1

    bin_dir = tmp_path / "blobs"
    bin_dir.mkdir()
    payload = bytes(range(16))
    (bin_dir / "x.bin").write_bytes(payload)
    (bin_dir / "skip.dat").write_bytes(b"nope")
    blobs = sources.read_binary_files(spark, str(bin_dir), path_glob="*.bin")
    rows = blobs.collect()
    assert len(rows) == 1
    assert rows[0]["length"] == 16 and bytes(rows[0]["content"]) == payload

    csv_out = str(tmp_path / "csv_out")
    sources.write_csv(df, csv_out)
    again = sources.read_csv(spark, csv_out, schema="id int, s string, v double")
    assert again.count() == 2
    json_out = str(tmp_path / "json_out")
    sources.write_json(df, json_out)
    assert sources.read_json(spark, json_out, schema="id long, s string, v double").count() == 2

def test_binary_file_ingest_feeds_multimodal_ops(spark, tmp_path):
    """End-to-end multimodal ingest: binaryFile source → blob stats →
    fake featurizer — the exact plumbing a real image/audio corpus uses
    (decode itself is real — PIL or the built-in PPM/BMP codecs)."""
    import hashlib

    from sparkflow_spark import multimodal, sources

    bin_dir = tmp_path / "media"
    bin_dir.mkdir()
    payloads = {f"b{i}.img": bytes([i]) * (10 + i) for i in range(3)}
    for name, blob in payloads.items():
        (bin_dir / name).write_bytes(blob)

    blobs = sources.read_binary_files(spark, str(bin_dir))
    stats = multimodal.binary_stats(blobs, content_col="content")
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in stats.collect()}
    for name, blob in payloads.items():
        assert rows[name]["n_bytes"] == len(blob)
        assert rows[name]["content_sha"] == hashlib.sha256(blob).hexdigest()

    ided = blobs.select(
        F.xxhash64("path").alias("doc_id"), "content"
    )
    feats = multimodal.extract_features(ided, id_col="doc_id").collect()
    assert len(feats) == 3 and all(len(r["features"]) == 8 for r in feats)


def test_observe_metrics_free_telemetry(spark, sf_dir):
    """Metrics ride the existing job: one action yields both the result
    and the observed aggregates, matching a direct computation."""
    import pyspark.sql.functions as F

    from sparkflow_spark.operators import observe_metrics

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.length("text").alias("n_chars2")
    )
    observed, obs = observe_metrics(
        docs,
        "corpus_stats",
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_chars2").alias("chars"),
        F.max("doc_id").alias("max_id"),
    )
    n = observed.count()  # the ONE action; metrics accumulate inside it
    direct = docs.agg(
        F.count(F.lit(1)), F.sum("n_chars2"), F.max("doc_id")
    ).first()
    assert obs.get["rows"] == n == direct[0]
    assert obs.get["chars"] == direct[1]
    assert obs.get["max_id"] == direct[2]


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=1,
        max_size=40,
    )
)
def test_prop_connected_components_vs_union_find(edges):
    """Random edge lists (self-loops and duplicates included) against a
    python union-find oracle — the propagate+shortcut fixpoint must be
    exactly the min-id component labeling for every graph shape, not
    just the hand-picked cliques of the fixed test."""
    from sparkflow_spark.dedup import connected_components

    spark = _prop_spark()
    pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    comp = {
        r["node"]: r["component"] for r in connected_components(pairs).collect()
    }
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    roots: dict[int, int] = {}
    for n in parent:
        roots.setdefault(find(n), n)
        roots[find(n)] = min(roots[find(n)], n)
    expected = {n: roots[find(n)] for n in parent}
    assert comp == expected


def test_xml_roundtrip(spark, tmp_path):
    """Spark 4 built-in XML source: write → read back identical rows
    (struct nesting survives; schema passed explicitly on read)."""
    from sparkflow_spark.sources import read_xml, write_xml

    df = spark.createDataFrame(
        [(1, "a&b <c>", 1.5), (2, None, -0.25)],
        "id long, v string, x double",
    )
    dest = str(tmp_path / "xml_rt")
    write_xml(df, dest, row_tag="rec", root_tag="recs")
    back = read_xml(spark, dest, row_tag="rec", schema="id long, v string, x double")
    got = sorted((r["id"], r["v"], r["x"]) for r in back.collect())
    assert got == [(1, "a&b <c>", 1.5), (2, None, -0.25)]


def test_compact_parquet_preserves_content(spark, tmp_path):
    """Compaction collapses a many-file table to the computed file
    count and the order-independent checksum is invariant — the
    rewrite-safety property that lets a maintenance job run without a
    verification re-read of the source."""
    from sparkflow_spark.operators import table_checksum
    from sparkflow_spark.sources import compact_parquet

    src, dest = str(tmp_path / "frag"), str(tmp_path / "compacted")
    df = spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 7).cast("string").alias("g")
    )
    df.repartition(64).write.parquet(src)  # fragment: 64 small files
    import os

    assert len([f for f in os.listdir(src) if f.endswith(".parquet")]) == 64
    n = compact_parquet(spark, src, dest, target_rows_per_file=2500)
    assert n == 4  # ceil(10000 / 2500)
    before = table_checksum(spark.read.parquet(src), ["id", "g"]).collect()[0]
    after = table_checksum(spark.read.parquet(dest), ["id", "g"]).collect()[0]
    assert before["n_rows"] == after["n_rows"] == 10_000
    assert before["checksum"] == after["checksum"]


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution: files written before a column existed read
    back as NULL for that column under mergeSchema — the contract that
    lets a 100 TB table add columns without rewriting history."""
    base = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(
        base + "/batch=0"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.parquet(base + "/batch=1")
    merged = spark.read.option("mergeSchema", "true").parquet(base)
    rows = {r["id"]: r for r in merged.collect()}
    assert set(merged.columns) >= {"id", "v", "score"}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5


def test_overwrite_partitions_touches_only_present_ones(spark, tmp_path):
    """Dynamic partition overwrite: backfilling one partition rewrites
    it and leaves the others byte-identical; re-running the backfill is
    idempotent. (Static mode would delete the absent partitions — the
    incident class this helper prevents.)"""
    from sparkflow_spark.operators import table_checksum
    from sparkflow_spark.sources import overwrite_partitions

    dest = str(tmp_path / "days")
    full = spark.createDataFrame(
        [(d, i, f"v{d}-{i}") for d in ("d1", "d2", "d3") for i in range(10)],
        "day string, id long, v string",
    )
    overwrite_partitions(full, dest, ["day"])
    d2_before = table_checksum(
        spark.read.parquet(dest).where(F.col("day") == "d2"), ["id", "v"]
    ).collect()[0]
    fix = spark.createDataFrame(
        [("d1", i, f"FIXED-{i}") for i in range(5)], "day string, id long, v string"
    )
    overwrite_partitions(fix, dest, ["day"])
    overwrite_partitions(fix, dest, ["day"])  # idempotent re-run
    back = spark.read.parquet(dest)
    assert back.where(F.col("day") == "d1").count() == 5
    assert back.where(F.col("day") == "d2").count() == 10
    assert back.where(F.col("day") == "d3").count() == 10
    d2_after = table_checksum(
        back.where(F.col("day") == "d2"), ["id", "v"]
    ).collect()[0]
    assert (d2_before["n_rows"], d2_before["checksum"]) == (
        d2_after["n_rows"], d2_after["checksum"])


def test_json_quarantine_split(spark, tmp_path):
    """Malformed JSON lines land in the quarantine frame with their raw
    text; clean rows parse fully; nothing is silently dropped."""
    from sparkflow_spark.sources import read_json_with_quarantine

    p = tmp_path / "in.json"
    p.write_text(
        '{"id": 1, "v": "ok"}\n'
        '{"id": 2, "v": "also ok"}\n'
        "{this is not json}\n"
        '{"id": "not-a-long", "v": 3}\n'
    )
    clean, quarantine = read_json_with_quarantine(
        spark, str(p), "id long, v string"
    )
    good = sorted((r["id"], r["v"]) for r in clean.collect())
    bad = [r["raw"] for r in quarantine.collect()]
    assert good == [(1, "ok"), (2, "also ok")]
    assert len(bad) == 2 and any("not json" in b for b in bad)
    assert all(r["source_file"].endswith("in.json") for r in quarantine.collect())


def test_dynamic_partition_pruning_on_join(spark, sf_dir, tmp_path):
    """Star-schema scan contract at 100 TB: a fact table partitioned on
    the join key must be pruned by a FILTERED dimension at RUNTIME
    (dynamic partition pruning), not scanned fully — the dim filter
    can't be pushed statically because the fact predicate only exists
    through the join. Asserts the dynamicpruning subquery reaches the
    fact scan's PartitionFilters AND the result equals the statically
    pre-filtered twin."""
    t = Tables(spark, sf_dir)
    out = str(tmp_path / "orders_by_yr_dpp")
    fact = t.orders.withColumn("yr", F.year("o_orderdate"))
    sources.write_partitioned(fact, out, ["yr"])
    back = sources.read_parquet(spark, out)

    years = (
        fact.select("yr").distinct().withColumn("keep", F.col("yr") % 2 == 0)
    )
    dim = years.filter("keep").select("yr")
    joined = back.join(dim, "yr").groupBy("yr").agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("rev")
    )
    plan = _plan(joined)
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    expect = {
        (r["yr"], r["n"], float(r["rev"]))
        for r in fact.join(dim, "yr")
        .groupBy("yr")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("rev"))
        .collect()
    }
    got = {(r["yr"], r["n"], float(r["rev"])) for r in joined.collect()}
    assert got == expect and len(got) > 0


def test_read_parquet_robust_skips_corrupt_file(spark, tmp_path):
    """A truncated/garbage .parquet object must not kill the scan:
    robust read returns every healthy row; the strict reader fails."""
    out = str(tmp_path / "mixed")
    df = spark.range(0, 100).withColumn("v", F.col("id") * 2)
    df.coalesce(2).write.parquet(out)
    with open(out + "/part-corrupt.parquet", "wb") as f:
        f.write(b"PAR1 this is not a real parquet footer")

    back = sources.read_parquet_robust(spark, out, schema="id bigint, v bigint")
    assert back.count() == 100
    assert back.agg(F.sum("v")).first()[0] == sum(2 * i for i in range(100))

    with pytest.raises(Exception):
        spark.read.schema("id bigint, v bigint").parquet(out).count()


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)),
        min_size=0,
        max_size=12,
    ),
    st.lists(st.integers(1, 5), min_size=15, max_size=15),
)
def test_prop_near_dedup_keep_best_matches_union_find(edges, lengths):
    """keep_best == python union-find + per-component argmax(n_chars,
    then min id) on random small graphs (self-loops dropped)."""
    from sparkflow_spark.dedup import near_dedup_keep_best

    spark = _prop_spark()
    n = 15
    docs = spark.createDataFrame(
        [(i, f"doc {i}", lengths[i]) for i in range(n)],
        "doc_id long, text string, n_chars long",
    )
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges or [(99, 98)], "id_a long, id_b long")
    if not edges:
        pairs = pairs.limit(0)
    got = sorted(
        r["doc_id"]
        for r in near_dedup_keep_best(docs, pairs).select("doc_id").collect()
    )

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps: dict = {}
    for i in range(n):
        comps.setdefault(find(i), []).append(i)
    want = sorted(
        max(members, key=lambda i: (lengths[i], -i))
        for members in comps.values()
    )
    assert got == want


def test_write_partitioned_coalesces_files(spark, tmp_path):
    """coalesce_partitions must give ONE file per partition dir (the
    sub-openCost small-files fix, SCALE.md round-7h) without changing
    content; False keeps the raw many-files-per-dir layout."""
    import glob as _glob

    from sparkflow_spark import sources

    df = (
        spark.range(4000)
        .select((F.col("id") % 4).alias("yr"), F.col("id").alias("v"))
        .repartition(16)
    )
    one = str(tmp_path / "one")
    sources.write_partitioned(df, one, ["yr"])
    files_per_dir = [
        len(_glob.glob(f"{one}/yr={y}/*.parquet")) for y in range(4)
    ]
    assert files_per_dir == [1, 1, 1, 1]
    raw = str(tmp_path / "raw")
    sources.write_partitioned(df, raw, ["yr"], coalesce_partitions=False)
    assert sum(len(_glob.glob(f"{raw}/yr={y}/*.parquet")) for y in range(4)) > 4
    a = sorted((r["yr"], r["v"]) for r in spark.read.parquet(one).collect())
    b = sorted((r["yr"], r["v"]) for r in spark.read.parquet(raw).collect())
    assert a == b and len(a) == 4000
