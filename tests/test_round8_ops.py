"""Round-8 regression tests — r7 ADVICE.md fixes + the new takedown /
artifact lifecycles.

Pins: the versioned bloom artifact (save/load, staleness contract,
torn-write invisibility, param-mismatch refusal), LSH/IVF tombstones
(delete → immediate query exclusion → compaction physically removes →
rebuild equality), the CDC sink's op_col delete path, the range joins'
max_bins_per_interval guard, the expired-lease takeover confirmation,
snapshot_changes on composite/heterogeneous keys, and the split cut
rounding.
"""

from __future__ import annotations

import json
import os

import pytest
import pyspark.sql.functions as F


# ---------------------------------------------------------------- bloom


def test_bloom_artifact_save_load_roundtrip(spark, tmp_path):
    from sparkflow_spark.bloom_artifact import (
        ensure_bloom,
        latest_bloom_version,
        load_bloom,
        save_bloom,
    )

    path = str(tmp_path / "bloom")
    corpus = spark.createDataFrame([(f"u{i}",) for i in range(500)], "user_id string")
    bloom, meta = ensure_bloom(spark, corpus, path, "user_id", n_bits=1 << 14, k=5)
    assert latest_bloom_version(path) == 0
    assert meta["n_bits"] == 1 << 14 and meta["k"] == 5 and meta["on"] == "user_id"
    # second ensure LOADS (no rebuild): byte-identical artifact
    bloom2, _ = ensure_bloom(spark, corpus, path, "user_id", n_bits=1 << 14, k=5)
    assert bloom2 == bloom
    # explicit save bumps the version; both stay addressable
    v = save_bloom(path, bloom, on="user_id", k=5, corpus_version="v1")
    assert v == 1 and latest_bloom_version(path) == 1
    old, _ = load_bloom(path, 0)
    assert old == bloom


def test_bloom_artifact_staleness_contract(spark, tmp_path):
    """A bitmap built at corpus version V never false-negatives a key
    present at V — appends add keys, old bitmaps stay exact for old
    keys; the rebuilt version covers the new ones."""
    from sparkflow_spark.bloom_artifact import ensure_bloom, load_bloom, save_bloom
    from sparkflow_spark.operators import bloom_might_contain, build_bloom_filter

    path = str(tmp_path / "bloom")
    old_keys = [(f"old{i}",) for i in range(300)]
    corpus_v0 = spark.createDataFrame(old_keys, "user_id string")
    bloom_v0, _ = ensure_bloom(spark, corpus_v0, path, "user_id", n_bits=1 << 14, k=5)

    # corpus grows; old bitmap still has NO false negatives on old keys
    probe_old = spark.createDataFrame(old_keys, "user_id string")
    hits = probe_old.where(
        bloom_might_contain(spark, bloom_v0, F.col("user_id"), k=5)
    ).count()
    assert hits == len(old_keys)

    new_keys = [(f"new{i}",) for i in range(200)]
    corpus_v1 = spark.createDataFrame(old_keys + new_keys, "user_id string")
    bloom_v1 = build_bloom_filter(corpus_v1, "user_id", n_bits=1 << 14, k=5)
    save_bloom(path, bloom_v1, on="user_id", k=5, corpus_version="v1")
    latest, _ = load_bloom(path)
    probe_all = spark.createDataFrame(old_keys + new_keys, "user_id string")
    assert (
        probe_all.where(bloom_might_contain(spark, latest, F.col("user_id"), k=5)).count()
        == len(old_keys) + len(new_keys)
    )


def test_bloom_artifact_torn_write_invisible(spark, tmp_path):
    """A v=N dir without the manifest flip does not exist for readers."""
    from sparkflow_spark.bloom_artifact import ensure_bloom, load_bloom

    path = str(tmp_path / "bloom")
    corpus = spark.createDataFrame([("a",), ("b",)], "user_id string")
    bloom, _ = ensure_bloom(spark, corpus, path, "user_id", n_bits=1 << 10, k=3)
    torn = os.path.join(path, "v=1")
    os.makedirs(torn)
    with open(os.path.join(torn, "bloom.bin"), "wb") as f:
        f.write(b"\x00" * 16)  # no _meta.json, no manifest flip
    got, meta = load_bloom(path)
    assert got == bloom
    with pytest.raises(ValueError, match="beyond the committed"):
        load_bloom(path, 1)


def test_bloom_artifact_param_mismatch_refuses(spark, tmp_path):
    from sparkflow_spark.bloom_artifact import ensure_bloom

    path = str(tmp_path / "bloom")
    corpus = spark.createDataFrame([("a",)], "user_id string")
    ensure_bloom(spark, corpus, path, "user_id", n_bits=1 << 10, k=3)
    with pytest.raises(ValueError, match="must match"):
        ensure_bloom(spark, corpus, path, "user_id", n_bits=1 << 12, k=3)
    with pytest.raises(ValueError, match="must match"):
        ensure_bloom(spark, corpus, path, "other_col", n_bits=1 << 10, k=3)


# ------------------------------------------------------- LSH tombstones


def _mk_docs(spark, n=40, groups=8):
    rows = []
    for i in range(n):
        g = i % groups
        base = f"the quick brown fox {g} jumps over the lazy dog {g} again and again"
        rows.append((i, base + (" extra tail token" if i >= n - 2 else "")))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_delete_excludes_then_compaction_removes(spark, tmp_path):
    from sparkflow_spark.lsh_index import (
        build_lsh_index,
        compact_lsh_index,
        delete_from_lsh_index,
        query_lsh_index,
    )

    docs = _mk_docs(spark)
    path = str(tmp_path / "lsh")
    build_lsh_index(docs, path, num_hashes=32, bands=8)
    probes = docs.limit(6)
    before = query_lsh_index(spark, path, probes, min_est_jaccard=0.5)
    victims = sorted({r.match_id for r in before.collect()})[:2]
    assert victims, "fixture must produce matches"

    victims_df = spark.createDataFrame([(v,) for v in victims], "doc_id long")
    delete_from_lsh_index(spark, path, victims_df)
    # immediate logical exclusion
    after = {r.match_id for r in query_lsh_index(spark, path, probes, 0.5).collect()}
    assert not (after & set(victims))

    # compaction physically removes + clears tombstones
    stats = compact_lsh_index(spark, path, target_rows_per_file=10_000)
    assert stats["tombstoned_ids"] == len(victims)
    assert not os.path.isdir(os.path.join(path, "tombstones"))
    sig_ids = {r.doc_id for r in spark.read.parquet(os.path.join(path, "sigs")).select("doc_id").collect()}
    bkt_ids = {r.doc_id for r in spark.read.parquet(os.path.join(path, "buckets")).select("doc_id").collect()}
    assert not (sig_ids & set(victims)) and not (bkt_ids & set(victims))
    # query results unchanged by the physical removal
    post = {r.match_id for r in query_lsh_index(spark, path, probes, 0.5).collect()}
    assert post == after


def test_lsh_delete_then_compact_equals_rebuild(spark, tmp_path):
    """delete + compact == index built from corpus-minus-deleted."""
    from sparkflow_spark.lsh_index import (
        build_lsh_index,
        compact_lsh_index,
        delete_from_lsh_index,
        query_lsh_index,
    )

    docs = _mk_docs(spark)
    victims = [1, 9, 17]
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    build_lsh_index(docs, a, num_hashes=32, bands=8)
    delete_from_lsh_index(spark, a, spark.createDataFrame([(v,) for v in victims], "doc_id long"))
    compact_lsh_index(spark, a)
    build_lsh_index(docs.where(~F.col("doc_id").isin(victims)), b, num_hashes=32, bands=8)
    probes = docs.where(~F.col("doc_id").isin(victims)).limit(8)
    ra = {(r.probe_id, r.match_id, round(r.est_jaccard, 9)) for r in query_lsh_index(spark, a, probes, 0.3).collect()}
    rb = {(r.probe_id, r.match_id, round(r.est_jaccard, 9)) for r in query_lsh_index(spark, b, probes, 0.3).collect()}
    assert ra == rb and ra


# ------------------------------------------------------- IVF tombstones


def test_ivf_delete_excludes_then_vacuum_removes(spark, tmp_path):
    import random

    from sparkflow_spark.vector_index import (
        build_ivf_index,
        delete_from_ivf_index,
        query_ivf_index,
        vacuum_ivf_index,
    )

    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(120)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf")
    build_ivf_index(vecs, path, n_centroids=4)
    probes = spark.createDataFrame(rows[:5], "probe_id long, embedding array<double>")
    before = query_ivf_index(spark, path, probes, k=3, n_probe=4).collect()
    victims = sorted({r.id for r in before})[:2]

    delete_from_ivf_index(spark, path, spark.createDataFrame([(v,) for v in victims], "vec_id long"))
    after = query_ivf_index(spark, path, probes, k=3, n_probe=4).collect()
    assert not ({r.id for r in after} & set(victims))
    # still k results per probe: survivors fill the ranks
    per_probe = {}
    for r in after:
        per_probe[r.probe_id] = per_probe.get(r.probe_id, 0) + 1
    assert all(v == 3 for v in per_probe.values())

    n = vacuum_ivf_index(spark, path)
    assert n == len(victims)
    assert not os.path.isdir(os.path.join(path, "tombstones"))
    left = {r.id for r in spark.read.parquet(os.path.join(path, "cells")).select("id").collect()}
    assert not (left & set(victims))
    post = query_ivf_index(spark, path, probes, k=3, n_probe=4).collect()
    key = lambda rs: {(r.probe_id, r.id, round(r.cosine, 9)) for r in rs}  # noqa: E731
    assert key(post) == key(after)


# --------------------------------------------------- CDC op_col deletes


def test_stream_merge_op_col_delete(spark, tmp_path):
    """A winning _op=delete removes the key; an OUTRANKED delete does
    not (CDC arbitration applies to deletes like any row)."""
    from sparkflow_spark.streaming.sinks import read_snapshot, stream_merge_to_parquet

    src_dir = str(tmp_path / "src")
    out = str(tmp_path / "table")
    rows = [
        ("k1", 10, 1, "upsert"),
        ("k2", 20, 1, "upsert"),
        ("k3", 30, 1, "upsert"),
        ("k1", 0, 5, "delete"),   # outranks seq=1 → k1 removed
        ("k2", 99, 0, "delete"),  # OUTRANKED by seq=1 → ignored
    ]
    spark.createDataFrame(
        rows, "k string, v int, seq int, _op string"
    ).write.mode("overwrite").json(src_dir)
    sdf = spark.readStream.schema("k string, v int, seq int, _op string").json(src_dir)
    stream_merge_to_parquet(sdf, out, keys=["k"], order_col="seq", op_col="_op")
    snap = read_snapshot(spark, out)
    got = {r.k: r.v for r in snap.collect()}
    assert got == {"k2": 20, "k3": 30}
    assert "_op" not in snap.columns


def test_stream_merge_op_col_delete_plain_upsert(spark, tmp_path):
    """Without order_col the delta wins: a delete in the delta removes
    the key a previous batch wrote; snapshot_changes reports it."""
    from sparkflow_spark.streaming.sinks import (
        read_snapshot,
        snapshot_changes,
        stream_merge_to_parquet,
    )

    out = str(tmp_path / "table")
    b1 = str(tmp_path / "b1")
    spark.createDataFrame(
        [("k1", 1, "upsert"), ("k2", 2, "upsert")], "k string, v int, _op string"
    ).write.mode("overwrite").json(b1)
    sdf = spark.readStream.schema("k string, v int, _op string").json(b1)
    stream_merge_to_parquet(sdf, out, keys=["k"], op_col="_op")
    spark.createDataFrame(
        [("k1", 0, "delete"), ("k3", 3, "upsert")], "k string, v int, _op string"
    ).write.mode("append").json(b1)
    sdf = spark.readStream.schema("k string, v int, _op string").json(b1)
    stream_merge_to_parquet(sdf, out, keys=["k"], op_col="_op")
    got = {r.k: r.v for r in read_snapshot(spark, out).collect()}
    assert got == {"k2": 2, "k3": 3}
    changes = {(r._op, r.k) for r in snapshot_changes(spark, out).collect()}
    assert ("delete", "k1") in changes and ("insert", "k3") in changes


# --------------------------------------------- snapshot_changes markers


def test_snapshot_changes_heterogeneous_composite_keys(spark, tmp_path):
    """Composite keys of mixed types (string + int) must classify
    correctly — the old coalesce-across-keys probe type-coerced."""
    from sparkflow_spark.streaming.sinks import snapshot_changes, stream_merge_to_parquet

    out = str(tmp_path / "table")
    b = str(tmp_path / "b")
    spark.createDataFrame(
        [("a", 1, 10), ("b", 2, 20)], "k1 string, k2 int, v int"
    ).write.mode("overwrite").json(b)
    sdf = spark.readStream.schema("k1 string, k2 int, v int").json(b)
    stream_merge_to_parquet(sdf, out, keys=["k1", "k2"])
    spark.createDataFrame(
        [("a", 1, 11), ("c", 3, 30)], "k1 string, k2 int, v int"
    ).write.mode("append").json(b)
    sdf = spark.readStream.schema("k1 string, k2 int, v int").json(b)
    stream_merge_to_parquet(sdf, out, keys=["k1", "k2"])
    got = {(r.k1, r.k2): r._op for r in snapshot_changes(spark, out).collect()}
    assert got == {("a", 1): "update", ("c", 3): "insert"}


# ------------------------------------------------------ range-join guard


def test_interval_join_max_bins_guard(spark):
    from sparkflow_spark.operators import interval_join

    points = spark.createDataFrame([(1, 5)], "pid int, p long")
    dirty = spark.createDataFrame([(1, 0, 10_000_000)], "iid int, s long, e long")
    out = interval_join(points, dirty, "p", "s", "e", bin_width=10,
                        max_bins_per_interval=1000)
    with pytest.raises(Exception, match="max_bins_per_interval"):
        out.count()
    # clean spans under the cap pass through unchanged
    clean = spark.createDataFrame([(1, 0, 100)], "iid int, s long, e long")
    ok = interval_join(points, clean, "p", "s", "e", bin_width=10,
                       max_bins_per_interval=1000)
    assert ok.count() == 1


def test_overlap_join_max_bins_guard(spark):
    from sparkflow_spark.operators import overlap_join

    left = spark.createDataFrame([(1, 0, 5)], "lid int, ls long, le long")
    dirty = spark.createDataFrame([(9, 3, 99_999_999)], "rid int, rs long, re long")
    with pytest.raises(Exception, match="max_bins_per_interval"):
        overlap_join(left, dirty, "ls", "le", "rs", "re", bin_width=10,
                     max_bins_per_interval=100).count()


# ------------------------------------------------------ lease takeover


def test_expired_lease_takeover_loser_conflicts(tmp_path):
    """Simulate the two-contender expired-lease race: after a foreign
    replace lands last, the earlier contender's confirmation read must
    raise instead of returning a token it does not hold."""
    import time

    from sparkflow_spark.streaming.sinks import (
        WriterConflict,
        acquire_writer_lease,
        release_writer_lease,
    )

    path = str(tmp_path / "t")
    os.makedirs(path)
    lease = os.path.join(path, "_WRITER_LEASE")
    # plant an expired lease
    with open(lease, "w") as f:
        json.dump({"token": "dead", "expires": time.time() - 10}, f)
    tok = acquire_writer_lease(path, ttl_seconds=60)
    # contender B's replace lands after A's (simulated foreign write)
    with open(lease, "w") as f:
        json.dump({"token": "other-writer", "expires": time.time() + 60}, f)
    with pytest.raises(WriterConflict):
        release_writer_lease(path, tok)
    # and a fresh expired-takeover attempt against a LIVE foreign lease
    # conflicts outright
    with pytest.raises(WriterConflict):
        acquire_writer_lease(path, ttl_seconds=60)


# ------------------------------------------------------- split rounding


def test_split_cut_literals_match_decimal_accumulation(spark):
    """0.8/0.1/0.1 fractions must cut at the literals 0.8 and 0.9 —
    not 0.9000000000000001 (the ulp that can flip a boundary row
    cross-engine)."""
    from sparkflow_spark.operators import hash_split, stratified_exact_split

    n = 1000
    df = spark.createDataFrame([(i, i % 3) for i in range(n)], "id long, g int")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = stratified_exact_split(df, "id", ["g"], fr)
    counts = {r.split: r.c for r in out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    # exact floor cuts per stratum: 3 strata of ~333 → 80/10/10 within 1/stratum
    assert counts["train"] == sum(int(0.8 * m) for m in (334, 333, 333))
    hs = hash_split(df, "id", fr)
    assert hs.where(F.col("split").isNull()).count() == 0


def test_stream_merge_tombstone_blocks_late_resurrection(spark, tmp_path):
    """A late OLDER row arriving in a batch after its key's delete must
    NOT resurrect the key: winning tombstones are retained and re-enter
    arbitration (the Cassandra/Delta tombstone-retention semantics)."""
    from sparkflow_spark.streaming.sinks import read_snapshot, stream_merge_to_parquet

    out = str(tmp_path / "table")
    b = str(tmp_path / "b")
    spark.createDataFrame(
        [("k1", 1, 1, "upsert"), ("k1", 0, 100, "delete"), ("k2", 2, 1, "upsert")],
        "k string, v int, seq int, _op string",
    ).write.mode("overwrite").json(b)
    sdf = spark.readStream.schema("k string, v int, seq int, _op string").json(b)
    stream_merge_to_parquet(sdf, out, keys=["k"], order_col="seq", op_col="_op")
    # late batch: an OLD k1 row (seq=50 < tombstone's 100)
    spark.createDataFrame(
        [("k1", 7, 50, "upsert")], "k string, v int, seq int, _op string"
    ).write.mode("append").json(b)
    sdf = spark.readStream.schema("k string, v int, seq int, _op string").json(b)
    stream_merge_to_parquet(sdf, out, keys=["k"], order_col="seq", op_col="_op")
    got = {r.k: r.v for r in read_snapshot(spark, out).collect()}
    assert got == {"k2": 2}, got
    # but a genuinely NEWER row outranks the tombstone and re-creates
    spark.createDataFrame(
        [("k1", 9, 200, "upsert")], "k string, v int, seq int, _op string"
    ).write.mode("append").json(b)
    sdf = spark.readStream.schema("k string, v int, seq int, _op string").json(b)
    stream_merge_to_parquet(sdf, out, keys=["k"], order_col="seq", op_col="_op")
    got = {r.k: r.v for r in read_snapshot(spark, out).collect()}
    assert got == {"k1": 9, "k2": 2}, got


def test_q112_quantile_sketch_error_bound(spark, sf_dir):
    """The histogram-sketch quantile is the covering bin's UPPER edge:
    0 < est - exact_rank_quantile <= bin_width (128) for every day and
    every q — the deterministic accuracy contract of the mergeable
    sketch."""
    import math

    from sparkflow_spark.queries import load_all

    reg = load_all()
    out = {r.day: r for r in reg["q112_histogram_quantile_rollup"].fn(spark, sf_dir).collect()}
    t = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.to_date("o_orderdate").alias("d"), F.col("o_totalprice").alias("v")
    )
    fan = t.select(
        F.explode(F.sequence("d", F.date_add("d", 6))).alias("day"), "v"
    ).collect()
    by_day = {}
    for r in fan:
        by_day.setdefault(r.day, []).append(r.v)
    for day, vals in by_day.items():
        vals.sort()
        n = len(vals)
        row = out[day]
        assert row.n == n
        for q, est in ((0.50, row.p50), (0.95, row.p95), (0.99, row.p99)):
            exact = vals[max(0, math.ceil(q * n) - 1)]
            assert 0 < est - exact <= 128.0, (day, q, est, exact)


def test_bloom_append_is_union(spark, tmp_path):
    """append_to_bloom == rebuild over the unioned corpus, bit for bit
    (bloom bitmaps OR losslessly for appends)."""
    from sparkflow_spark.bloom_artifact import append_to_bloom, ensure_bloom, load_bloom
    from sparkflow_spark.operators import build_bloom_filter

    path = str(tmp_path / "b")
    old = [(f"o{i}",) for i in range(200)]
    new = [(f"n{i}",) for i in range(100)]
    ensure_bloom(spark, spark.createDataFrame(old, "user_id string"), path,
                 "user_id", n_bits=1 << 13, k=4)
    v = append_to_bloom(spark, spark.createDataFrame(new, "user_id string"), path)
    assert v == 1
    merged, _ = load_bloom(path)
    full = build_bloom_filter(
        spark.createDataFrame(old + new, "user_id string"), "user_id",
        n_bits=1 << 13, k=4)
    assert merged == full


def test_vacuum_tombstones_watermark_contract(spark, tmp_path):
    """Tombstones at or above the watermark survive (late data still
    blocked); below-watermark tombstones are dropped — and a late row
    older than a VACUUMED tombstone resurrects its key, the documented
    retention trade."""
    from sparkflow_spark.streaming.sinks import (
        read_snapshot,
        stream_merge_to_parquet,
        vacuum_tombstones,
    )

    out = str(tmp_path / "t")
    b = str(tmp_path / "b")
    spark.createDataFrame(
        [("k1", 1, 100, "delete"), ("k2", 2, 900, "delete"), ("k3", 3, 500, "upsert")],
        "k string, v int, seq int, _op string",
    ).write.mode("overwrite").json(b)
    sdf = spark.readStream.schema("k string, v int, seq int, _op string").json(b)
    stream_merge_to_parquet(sdf, out, keys=["k"], order_col="seq", op_col="_op")
    # watermark 800: k1's tombstone (seq=100) drops, k2's (seq=900) survives
    assert vacuum_tombstones(spark, out, 800) == 1
    assert vacuum_tombstones(spark, out, 800) == 0  # idempotent
    spark.createDataFrame(
        [("k1", 7, 50, "upsert"), ("k2", 8, 850, "upsert")],
        "k string, v int, seq int, _op string",
    ).write.mode("append").json(b)
    sdf = spark.readStream.schema("k string, v int, seq int, _op string").json(b)
    stream_merge_to_parquet(sdf, out, keys=["k"], order_col="seq", op_col="_op")
    got = {r.k: r.v for r in read_snapshot(spark, out).collect()}
    # k1 resurrected (its tombstone was vacuumed; the late row is older
    # than it was) — the documented trade; k2 still blocked (seq 850 < 900)
    assert got == {"k1": 7, "k3": 3}, got


def test_stream_additive_merge_equals_batch_agg(spark, tmp_path):
    """The streaming-maintained sketch table == one batch aggregate of
    everything, whatever the micro-batch split — additive merge done
    right (and a second incremental run keeps the invariant)."""
    from sparkflow_spark.streaming.sinks import (
        read_snapshot,
        stream_additive_merge_to_parquet,
    )

    out = str(tmp_path / "sketch")
    b = str(tmp_path / "b")
    rows1 = [("d1", 0, 3), ("d1", 1, 2), ("d2", 0, 5)]
    rows2 = [("d1", 0, 4), ("d2", 7, 1), ("d3", 0, 9)]
    spark.createDataFrame(rows1, "day string, bin int, c long").write.mode(
        "overwrite"
    ).json(b)
    sdf = spark.readStream.schema("day string, bin int, c long").option(
        "maxFilesPerTrigger", 1
    ).json(b)
    stream_additive_merge_to_parquet(sdf, out, keys=["day", "bin"], count_cols=["c"])
    spark.createDataFrame(rows2, "day string, bin int, c long").write.mode(
        "append"
    ).json(b)
    sdf = spark.readStream.schema("day string, bin int, c long").option(
        "maxFilesPerTrigger", 1
    ).json(b)
    stream_additive_merge_to_parquet(sdf, out, keys=["day", "bin"], count_cols=["c"])
    got = {(r.day, r.bin): r.c for r in read_snapshot(spark, out).collect()}
    want = {}
    for d, bn, c in rows1 + rows2:
        want[(d, bn)] = want.get((d, bn), 0) + c
    assert got == want, (got, want)


def test_plan_audit_library(spark, sf_dir):
    """sparkflow_spark.plans: the deploy-time plan guards as a library —
    clean plans pass, a deliberate cartesian fails with the property
    named, and rule knobs (pushdown, partial agg, broadcast) bind."""
    import pytest as _pytest

    from sparkflow_spark.catalog import Tables
    from sparkflow_spark.plans import PlanAssertionError, assert_scalable, plan_report
    from sparkflow_spark.queries import load_all

    reg = load_all()
    t = Tables(spark, sf_dir)

    # a representative healthy query passes with tightened rules
    rep = assert_scalable(
        reg["q13_hash_agg_tpch_q1"].fn(spark, sf_dir),
        require_partial_agg=True,
    )
    assert rep.n_hash_aggregates >= 2 and not rep.has_cartesian

    # pushdown rule binds on the filter query
    assert_scalable(
        reg["q02_filter_and"].fn(spark, sf_dir),
        require_pushed_filter="GreaterThan(l_quantity",
    )
    with _pytest.raises(PlanAssertionError, match="PushedFilters"):
        assert_scalable(
            reg["q02_filter_and"].fn(spark, sf_dir),
            require_pushed_filter="NoSuchFilter(",
        )

    # a deliberate cross join fails the default guard, named
    cross = t.region.crossJoin(t.nation)
    with _pytest.raises(PlanAssertionError, match="Cartesian|NestedLoop"):
        assert_scalable(cross)
    # and plan_report still describes it without raising
    rep = plan_report(cross)
    assert rep.has_cartesian or rep.has_nested_loop

    # broadcast requirement binds
    assert_scalable(
        reg["q05_broadcast_inner_join"].fn(spark, sf_dir),
        require_broadcast_join=True,
    )
