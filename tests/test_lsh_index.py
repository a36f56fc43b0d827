"""Persistent LSH index lifecycle: append==rebuild, query recall,
partition-pruned bucket scans."""

from __future__ import annotations

import pyspark.sql.functions as F

from sparkflow_spark.lsh_index import (
    append_to_lsh_index,
    build_lsh_index,
    load_params,
    query_lsh_index,
)


def _docs(spark, lo, hi, mutate=None):
    base = [
        (i, f"the quick brown fox jumps over lazy dog number {i} "
            f"with extra words {i % 7} {i % 11} repeated filler text here")
        for i in range(lo, hi)
    ]
    if mutate:
        base = [(i, mutate(i, t)) for i, t in base]
    return spark.createDataFrame(base, "doc_id long, text string")


def test_append_equals_rebuild(spark, tmp_path):
    """Indexing half then appending the other half produces the exact
    bucket table a full rebuild does (signatures are pure functions of
    text + params) — the invariant that makes incremental maintenance
    trustworthy."""
    full, inc = str(tmp_path / "full"), str(tmp_path / "inc")
    docs = _docs(spark, 0, 60)
    build_lsh_index(docs, full)
    build_lsh_index(docs.filter(F.col("doc_id") < 30), inc)
    append_to_lsh_index(spark, inc, docs.filter(F.col("doc_id") >= 30))
    a = sorted(
        map(tuple, spark.read.parquet(full + "/buckets")
            .select("doc_id", "band", "bucket").collect())
    )
    b = sorted(
        map(tuple, spark.read.parquet(inc + "/buckets")
            .select("doc_id", "band", "bucket").collect())
    )
    assert a == b and len(a) == 60 * 16  # one row per (doc, band)
    assert load_params(inc)["num_hashes"] == 64


def test_query_finds_planted_near_dup(spark, tmp_path):
    """A probe that is a light edit of an indexed doc surfaces as a
    candidate with high estimated jaccard; an unrelated probe finds
    nothing at the threshold."""
    path = str(tmp_path / "idx")
    build_lsh_index(_docs(spark, 0, 50), path)
    probes = spark.createDataFrame(
        [
            (1000, "the quick brown fox jumps over lazy dog number 7 "
                   "with extra words 0 7 repeated filler text here EDITED"),
            (2000, "completely unrelated content about spark catalyst "
                   "optimizer rules and adaptive execution plans"),
        ],
        "doc_id long, text string",
    )
    got = query_lsh_index(spark, path, probes, min_est_jaccard=0.4).collect()
    by_probe = {}
    for r in got:
        by_probe.setdefault(r["probe_id"], []).append(r)
    assert 1000 in by_probe and any(r["match_id"] == 7 for r in by_probe[1000])
    assert all(r["est_jaccard"] >= 0.4 for r in by_probe[1000])
    assert 2000 not in by_probe


def test_query_plan_is_keyed_join(spark, tmp_path):
    """The probe-bucket join is a keyed join on (band, bucket) — never
    a cartesian — and the bucket scan reads the band partition column."""
    path = str(tmp_path / "idx2")
    build_lsh_index(_docs(spark, 0, 30), path)
    q = query_lsh_index(spark, path, _docs(spark, 0, 3))
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_stream_maintained_index_equals_batch_build(spark, tmp_path):
    """A document stream appending into the index (one micro-batch per
    file) converges to the same bucket table a batch build produces —
    the streaming-ingest dedup-index shape."""
    from sparkflow_spark.streaming.sinks import stream_append_to_lsh_index

    docs = _docs(spark, 0, 40)
    src = str(tmp_path / "doc_stream")
    docs.repartition(4).write.parquet(src)  # 4 files → 4 micro-batches

    batch_idx = str(tmp_path / "batch_idx")
    build_lsh_index(docs, batch_idx)

    stream_idx = str(tmp_path / "stream_idx")
    build_lsh_index(docs.limit(0), stream_idx)  # params-only seed
    sdf = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = stream_append_to_lsh_index(sdf, stream_idx)
    q.awaitTermination()

    a = sorted(map(tuple, spark.read.parquet(batch_idx + "/buckets")
                   .select("doc_id", "band", "bucket").collect()))
    b = sorted(map(tuple, spark.read.parquet(stream_idx + "/buckets")
                   .select("doc_id", "band", "bucket").collect()))
    assert a == b and len(a) == 40 * 16


def test_reconcile_repairs_partial_append(spark, tmp_path):
    """Crash-between-writes repair (round-6 advice): sigs/ lands before
    buckets/, so a partial append leaves ORPHAN signatures (unreachable,
    recall intact) — never bucket rows whose candidates would silently
    drop. reconcile_lsh_index re-derives the missing bucket rows from
    the stored signatures and the repaired index equals a full build."""
    from sparkflow_spark.lsh_index import reconcile_lsh_index
    from sparkflow_spark.dedup import minhash_signatures
    import os

    path = str(tmp_path / "idx")
    docs = _docs(spark, 0, 40)
    build_lsh_index(docs.filter(F.col("doc_id") < 30), path)
    # simulate the crash: delta signatures written, bucket job never ran
    p = load_params(path)
    delta = docs.filter(F.col("doc_id") >= 30)
    minhash_signatures(
        delta, p["text_col"], p["id_col"], p["num_hashes"], p["shingle_k"], p["seed"]
    ).write.mode("append").parquet(os.path.join(path, "sigs"))

    assert reconcile_lsh_index(spark, path) == 10
    assert reconcile_lsh_index(spark, path) == 0  # idempotent

    ref = str(tmp_path / "ref")
    build_lsh_index(docs, ref)
    a = sorted(map(tuple, spark.read.parquet(path + "/buckets")
                   .select("doc_id", "band", "bucket").collect()))
    b = sorted(map(tuple, spark.read.parquet(ref + "/buckets")
                   .select("doc_id", "band", "bucket").collect()))
    assert a == b


def test_compact_preserves_queries_and_cuts_files(spark, tmp_path):
    """compact_lsh_index: after many O(delta) appends the index carries
    O(appends) sub-openCost files (the per-file task-tax class measured
    on the IVF cells table); compaction must cut the file count while
    leaving params, query results, and reconcile-consistency untouched."""
    from sparkflow_spark.lsh_index import (
        append_to_lsh_index,
        build_lsh_index,
        compact_lsh_index,
        load_params,
        query_lsh_index,
        reconcile_lsh_index,
    )

    idx = str(tmp_path / "idx")
    docs = _docs(spark, 0, 60)
    build_lsh_index(docs.filter(F.col("doc_id") < 20), idx)
    for lo in range(20, 60, 10):
        append_to_lsh_index(
            spark, idx, docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 10))
        )
    probes = _docs(spark, 0, 10)
    before = sorted(
        map(tuple, query_lsh_index(spark, idx, probes).collect())
    )
    params_before = load_params(idx)
    stats = compact_lsh_index(spark, idx, target_rows_per_file=1_000_000)
    assert stats["sigs_files_before"] > stats["sigs_files_after"]
    assert stats["buckets_files_before"] > stats["buckets_files_after"]
    after = sorted(
        map(tuple, query_lsh_index(spark, idx, probes).collect())
    )
    assert after == before and before  # identical results, non-empty
    assert load_params(idx) == params_before
    assert reconcile_lsh_index(spark, idx) == 0  # still self-consistent
