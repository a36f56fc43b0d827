"""Round-7 regression tests — ADVICE.md r6 fixes.

Pins: heavy_hitters exactness for non-string key types (no string
round-trip on the recount path), mmr_rerank schema following the input
id types, the half-away-from-zero centroid rounding matching DuckDB's
SQL ROUND, and the LSH index sig-dedup defense.
"""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F


def test_heavy_hitters_exact_on_double_keys(spark):
    """Float keys whose string rendering is not guaranteed to cast back
    value-preservingly must still surface with EXACT counts."""
    from sparkflow_spark.operators import heavy_hitters

    hot = 0.1 + 0.2  # 0.30000000000000004 — classic non-clean repr
    rows = [(i, hot) for i in range(900)]
    rows += [(1000 + i, float(i) + 0.123456789e-3) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, key double").repartition(8)
    out = {r["key"]: r["cnt"] for r in heavy_hitters(df, "key", k=3).collect()}
    assert out == {hot: 900}


def test_heavy_hitters_exact_on_timestamp_keys(spark):
    from sparkflow_spark.operators import heavy_hitters

    hot = datetime.datetime(2024, 1, 1, 12, 0, 0, 123456)
    rows = [(i, hot) for i in range(800)]
    rows += [
        (1000 + i, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=i, microseconds=7))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, key timestamp").repartition(8)
    out = {r["key"]: r["cnt"] for r in heavy_hitters(df, "key", k=4).collect()}
    assert out == {hot: 800}


def test_mmr_rerank_string_ids(spark):
    """mmr_rerank output schema must follow the candidate table's id
    types — string probe/vec ids flow through unchanged."""
    from sparkflow_spark.similarity import mmr_rerank

    rows = [
        ("p1", "docA", 0.99, [1.0, 0.0]),
        ("p1", "docB", 0.98, [1.0, 0.01]),  # near-copy of docA
        ("p1", "docC", 0.50, [0.0, 1.0]),   # different direction
    ]
    df = spark.createDataFrame(
        rows, "probe_id string, vec_id string, cosine double, embedding array<double>"
    )
    out = mmr_rerank(df, k=2, lam=0.5)
    assert dict(out.dtypes)["probe_id"] == "string"
    assert dict(out.dtypes)["vec_id"] == "string"
    got = {r["mmr_rank"]: r["vec_id"] for r in out.collect()}
    # rank 1 = best relevance; rank 2 diversifies away from docA's copy
    assert got == {1: "docA", 2: "docC"}


def test_round6_half_away_matches_duckdb_round():
    """Centroid rounding must match SQL ROUND (half away from zero) —
    Python's banker's round diverges on these exact values."""
    import duckdb

    from sparkflow_spark.similarity import _round6_half_away

    vals = [2.5e-6, -2.5e-6, 3.5e-6, 1.0000005, -1.0000005,
            0.1234565, -0.9999995, 7.5e-7, 0.0, -3.25e-6]
    for v in vals:
        d = duckdb.sql(f"select round({v!r}::double, 6)").fetchone()[0]
        assert _round6_half_away(v) == d, v
    # the two values where banker's rounding would differ
    assert _round6_half_away(3.5e-6) != round(3.5e-6, 6)
    assert _round6_half_away(0.1234565) != round(0.1234565, 6)


def test_lsh_query_dedupes_duplicated_sigs(spark, tmp_path):
    """An index whose append was (wrongly) re-run after a crash holds
    duplicate signature rows; query joins must not fan out."""
    import os

    from sparkflow_spark.lsh_index import (
        append_to_lsh_index,
        build_lsh_index,
        query_lsh_index,
    )

    base = spark.createDataFrame(
        [(i, f"the quick brown fox jumps over the lazy dog variant {i % 4}")
         for i in range(40)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "lshidx")
    build_lsh_index(base, path, text_col="text", id_col="doc_id")
    delta = spark.createDataFrame(
        [(100 + i, f"the quick brown fox jumps over the lazy dog variant {i % 4}")
         for i in range(8)],
        "doc_id long, text string",
    )
    append_to_lsh_index(spark, path, delta)
    # simulate the bad repair: re-run the same append (duplicate sigs)
    append_to_lsh_index(spark, path, delta)
    sigs = spark.read.parquet(os.path.join(path, "sigs"))
    assert sigs.count() > sigs.select("doc_id").distinct().count()

    probes = spark.createDataFrame(
        [(900, "the quick brown fox jumps over the lazy dog variant 1")],
        "doc_id long, text string",
    )
    out = query_lsh_index(spark, path, probes, min_est_jaccard=0.5)
    pairs = [(r["probe_id"], r["match_id"]) for r in out.collect()]
    assert len(pairs) == len(set(pairs)), "duplicated candidate rows"
    assert len(pairs) > 0


def test_no_driver_collect_in_registered_query_modules():
    """r6 verdict: no `.collect()` in any registered query's return
    path — the CDC snapshot wrapper now re-writes via a distributed
    parquet write under the warehouse dir. Sole exceptions: the
    probe-bounded index-lookup wrappers (IVF / LSH query results are
    |probes|-bounded, not data-scaled) — dedup_suite carries THREE
    since round 8 (the xxhash64 / md5 / takedown-md5 LSH index
    lifecycles, each probing 20 docs)."""
    import pathlib

    qdir = pathlib.Path(__file__).resolve().parent.parent / "sparkflow_spark" / "queries"
    allowed = {"dedup_suite.py": 3, "similarity_suite.py": 1}
    for f in sorted(qdir.glob("*.py")):
        hits = [
            i + 1
            for i, line in enumerate(f.read_text().splitlines())
            if ".collect()" in line
        ]
        cap = allowed.get(f.name, 0)
        assert len(hits) <= cap, (
            f"{f.name} lines {hits}: driver-side collect in a registered "
            "query module (allowed only for probe-bounded index lookups)"
        )


def test_hard_negative_ann_recall_vs_exact_twin(spark, sf_dir):
    """r6 verdict #2: the registered IVF-bucketed hard-negative miner
    must hold recall >= 0.9 against the exact quadratic twin. On the
    isotropic fixtures recall ~ probed-cell fraction; 6 of 8 cells
    measures 0.93-1.0 across the three SFs."""
    from sparkflow_spark.queries import load_all

    reg = load_all()
    exact = {
        (r["anchor_id"], r["hard_neg_id"])
        for r in reg["s_hard_negative_top1"].fn(spark, sf_dir).collect()
    }
    ann = {
        (r["anchor_id"], r["hard_neg_id"])
        for r in reg["s_hard_negative_ann"].fn(spark, sf_dir).collect()
    }
    assert len(ann) == len(exact)  # every anchor still mined
    recall = len(ann & exact) / len(exact)
    assert recall >= 0.9, f"recall {recall:.3f}"


def test_hard_negative_ann_wins_on_clustered_data(spark, tmp_path):
    """The production claim the isotropic fixtures can't exhibit: on
    CLUSTERED embeddings (where real text/image embeddings live), cell
    pruning keeps recall >= 0.9 while probing 2 of 8 cells — the
    candidate stream shrinks ~4x."""
    import numpy as np
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from sparkflow_spark.vector_index import build_ivf_index, query_ivf_index

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 16)) * 6.0
    rows = []
    for i in range(400):
        c = i % 8
        v = centers[c] + rng.standard_normal(16)
        rows.append((i, int(rng.integers(0, 4)), [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    idx = str(tmp_path / "ivf_clustered")
    build_ivf_index(df.select("vec_id", "embedding"), idx, n_centroids=8)

    probes = df.select(F.col("vec_id").alias("probe_id"), "embedding")
    cand = query_ivf_index(spark, idx, probes, k=32, n_probe=2)
    anch = df.select(F.col("vec_id").alias("probe_id"), F.col("label").alias("al"))
    neg = df.select(F.col("vec_id").alias("id"), F.col("label").alias("nl"))
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("id"))
    ann = {
        (r["probe_id"], r["id"])
        for r in (
            cand.filter(F.col("id") != F.col("probe_id"))
            .join(anch, "probe_id").join(neg, "id")
            .filter(F.col("nl") != F.col("al"))
            .withColumn("r2", F.row_number().over(w)).filter(F.col("r2") == 1)
        ).collect()
    }

    # exact twin, inline (broadcast nested loop is fine at 400 rows)
    from sparkflow_spark.functions.vector import dot, l2_norm

    a = df.select(
        F.col("vec_id").alias("pid"), F.col("label").alias("al"),
        F.col("embedding").alias("av"), l2_norm("embedding").alias("an"),
    )
    b = df.select("vec_id", "label", "embedding", l2_norm("embedding").alias("bn"))
    den = F.col("an") * F.col("bn")
    scored = b.join(
        F.broadcast(a),
        (F.col("vec_id") != F.col("pid")) & (F.col("label") != F.col("al")),
    ).select("pid", "vec_id", F.when(den != 0, dot("av", "embedding") / den).alias("cos"))
    we = Window.partitionBy("pid").orderBy(F.col("cos").desc(), F.col("vec_id"))
    exact = {
        (r["pid"], r["vec_id"])
        for r in scored.withColumn("r", F.row_number().over(we))
        .filter(F.col("r") == 1).collect()
    }
    recall = len(ann & exact) / len(exact)
    assert recall >= 0.9, f"clustered recall {recall:.3f} at n_probe=2/8"
    # the candidate stream really is pruned ~4x vs exhaustive probing
    n_pruned = query_ivf_index(spark, idx, probes, k=10**9, n_probe=2).count()
    n_full = query_ivf_index(spark, idx, probes, k=10**9, n_probe=8).count()
    assert n_pruned < 0.45 * n_full, (n_pruned, n_full)


def test_prefix_jaccard_lossless_where_cap_loses_recall(spark):
    """The point of the prefix-filter join: on boilerplate-heavy docs
    where every shingle's df exceeds the capped kernel's frequency cap,
    the cap drops qualifying pairs — the prefix filter must find every
    one (it is exact)."""
    import pyspark.sql.functions as F

    from sparkflow_spark.dedup import ngram_jaccard_pairs, prefix_filter_jaccard_pairs

    # 30 near-identical boilerplate docs: every shingle appears in ~30
    # docs, far above a df-cap of 5 — the capped kernel goes blind.
    base = "terms of service apply to all users of this website without exception"
    rows = [(i, base + f" clause {i % 2}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = ngram_jaccard_pairs(df, threshold=0.5, max_shingle_freq=5).count()
    exact = ngram_jaccard_pairs(df, threshold=0.5, max_shingle_freq=None)
    pf = prefix_filter_jaccard_pairs(df, threshold=0.5)
    exact_pairs = {(r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in exact.collect()}
    pf_pairs = {(r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in pf.collect()}
    assert capped == 0, "cap did not engage — test fixture no longer exercises it"
    assert len(exact_pairs) > 100  # ~C(15,2)*2 qualifying pairs exist
    assert pf_pairs == exact_pairs


def test_hard_negative_ann_plan_is_keyed_join(spark, sf_dir):
    """The ANN miner must never plan a nested loop over the corpus —
    candidates come from the `cell` equi-join (hash/SMJ), the exact
    twin keeps the BroadcastNestedLoopJoin."""
    from sparkflow_spark.queries import load_all

    df = load_all()["s_hard_negative_ann"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_stratified_exact_split_counts_and_determinism(spark):
    """Exact per-stratum proportions (the contract hash_split cannot
    give), determinism across repartitioning, and input validation."""
    import pytest

    from sparkflow_spark.operators import stratified_exact_split

    rows = [(i, f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "id long, src string")
    out = stratified_exact_split(
        df, "id", ["src"], {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    counts = {
        (r["src"], r["split"]): r["n"]
        for r in out.groupBy("src", "split").count().withColumnRenamed("count", "n").collect()
    }
    for s in ("s0", "s1", "s2"):  # 100 rows per stratum -> exactly 80/10/10
        assert counts[(s, "train")] == 80
        assert counts[(s, "val")] == 10
        assert counts[(s, "test")] == 10

    a = {(r["id"], r["split"]) for r in out.collect()}
    b = {
        (r["id"], r["split"])
        for r in stratified_exact_split(
            df.repartition(13), "id", ["src"], {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    assert a == b, "split assignment depends on layout"

    with pytest.raises(ValueError, match="sum to <= 1"):
        stratified_exact_split(df, "id", ["src"], {"a": 0.9, "b": 0.2})
    with pytest.raises(ValueError, match="non-empty"):
        stratified_exact_split(df, "id", ["src"], {})


def test_shard_assignment_stable_under_growth(spark, sf_dir):
    """The shard layout claim: an existing doc's shard never changes
    when the corpus grows (pure content function)."""
    import pyspark.sql.functions as F

    from sparkflow_spark.catalog import Tables

    docs = Tables(spark, sf_dir).documents.select("doc_id")
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shard7"))), 1, 8
            ),
            16, 10,
        ).cast("bigint") % 16
    )
    base = {r["doc_id"]: r["s"] for r in docs.limit(100).select("doc_id", shard.alias("s")).collect()}
    grown = {r["doc_id"]: r["s"] for r in docs.select("doc_id", shard.alias("s")).collect()}
    assert all(grown[k] == v for k, v in base.items())
    assert len(set(grown.values())) == 16  # every shard populated


def test_ewma_matches_python_reference(spark, sf_dir):
    """q107's 5-tap EWMA equals a direct python replay on a sampled
    user's ordered history."""
    from sparkflow_spark.catalog import Tables
    from sparkflow_spark.queries import load_all

    t = Tables(spark, sf_dir)
    uid = t.events.select("user_id").first()["user_id"]
    hist = sorted(
        ((r["ts"], r["event_id"], r["value"]) for r in
         t.events.where(F.col("user_id") == uid).collect())
    )
    got = {
        r["event_id"]: r["ewma"]
        for r in load_all()["q107_ewma_per_event"].fn(spark, sf_dir)
        .where(F.col("user_id") == uid).collect()
    }
    ws = [1.0, 0.5, 0.25, 0.125, 0.0625]
    for i, (_, eid, _) in enumerate(hist):
        vals = [hist[i - j][2] for j in range(min(i + 1, 5))]
        num = sum(w * v for w, v in zip(ws, vals))
        den = sum(ws[: len(vals)])
        assert abs(got[eid] - num / den) < 1e-6, eid


# ---- interval_join (binned range join) ----------------------------------


def _naive_pairs(points, ivals, closed):
    out = set()
    for pid, p in points:
        for iid, s, e in ivals:
            hi = p <= e if closed == "both" else p < e
            if s <= p and hi:
                out.add((pid, iid))
    return out


def test_interval_join_matches_naive_numeric(spark):
    """Bin explosion is an equi-join REWRITE, not an approximation:
    output matches the nested-loop definition for any bin width."""
    import random

    from sparkflow_spark.operators import interval_join

    rnd = random.Random(7)
    ivals = []
    for i in range(150):
        s = rnd.randint(0, 1000)
        ivals.append((i, s, s + rnd.randint(0, 60)))
    points = [(j, rnd.randint(-20, 1020)) for j in range(400)]
    pdf = spark.createDataFrame(points, "pid long, p long")
    idf = spark.createDataFrame(ivals, "iid long, s long, e long")
    for closed in ("left", "both"):
        want = _naive_pairs(points, ivals, closed)
        for w, salt in ((1, 1), (16, 1), (16, 4), (64, 1), (100000, 7)):
            rows = interval_join(
                pdf, idf, "p", "s", "e", bin_width=w, closed=closed, salt=salt
            ).collect()
            got = [(r["pid"], r["iid"]) for r in rows]
            assert len(got) == len(set(got)), (closed, w, salt)
            assert set(got) == want, (closed, w, salt)


def test_interval_join_timestamps_and_plan(spark):
    """Timestamp bounds work through the epoch-long path, and the
    physical plan is a hash/merge EQUI-join — never the
    BroadcastNestedLoopJoin a raw inequality join plans as."""
    import datetime

    from sparkflow_spark.operators import interval_join

    t0 = datetime.datetime(2024, 3, 1)
    pts = [(j, t0 + datetime.timedelta(hours=5 * j)) for j in range(200)]
    ivs = [
        (i, t0 + datetime.timedelta(days=i), t0 + datetime.timedelta(days=i, hours=36))
        for i in range(40)
    ]
    pdf = spark.createDataFrame(pts, "pid long, ts timestamp")
    idf = spark.createDataFrame(ivs, "iid long, st timestamp, en timestamp")
    out = interval_join(pdf, idf, "ts", "st", "en", bin_width=86400)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
    got = {(r["pid"], r["iid"]) for r in out.collect()}
    want = _naive_pairs(
        [(j, ts) for j, ts in pts], [(i, s, e) for i, s, e in ivs], "left"
    )
    assert got == want and got


def test_interval_join_validation(spark):
    import pytest

    from sparkflow_spark.operators import interval_join

    pdf = spark.createDataFrame([(1, 2)], "pid long, p long")
    idf = spark.createDataFrame([(1, 2, 3)], "iid long, s long, e long")
    with pytest.raises(ValueError, match="closed"):
        interval_join(pdf, idf, "p", "s", "e", 10, closed="right")
    with pytest.raises(ValueError, match="bin_width"):
        interval_join(pdf, idf, "p", "s", "e", 0)
    shared = spark.createDataFrame([(1, 2, 3)], "pid long, s long, e long")
    with pytest.raises(ValueError, match="disjoint"):
        interval_join(pdf, shared, "p", "s", "e", 10)


def test_overlap_join_matches_naive(spark):
    """Keyless interval-overlap join: bin rewrite + later-start claim
    equals the nested-loop definition, with no duplicate pairs, for
    any bin width."""
    import random

    from sparkflow_spark.operators import overlap_join

    rnd = random.Random(11)
    lrows, rrows = [], []
    for i in range(120):
        s = rnd.randint(0, 500)
        lrows.append((i, s, s + rnd.randint(1, 80)))
    for j in range(120):
        s = rnd.randint(0, 500)
        rrows.append((j, s, s + rnd.randint(1, 80)))
    ldf = spark.createDataFrame(lrows, "lid long, ls long, le long")
    rdf = spark.createDataFrame(rrows, "rid long, rs long, re long")
    want = {
        (li, rj)
        for li, ls, le in lrows
        for rj, rs, re in rrows
        if ls < re and rs < le
    }
    for w, salt in ((1, 1), (13, 1), (13, 4), (80, 1), (10000, 5)):
        got = [
            (r["lid"], r["rid"])
            for r in overlap_join(
                ldf, rdf, "ls", "le", "rs", "re", w, salt=salt
            ).collect()
        ]
        assert len(got) == len(set(got)), f"duplicate pairs at width {w}, salt {salt}"
        assert set(got) == want, (w, salt)


def test_overlap_join_plan_is_equi(spark):
    from sparkflow_spark.operators import overlap_join

    ldf = spark.range(100).select(
        F.col("id").alias("lid"),
        (F.col("id") * 3).alias("ls"),
        (F.col("id") * 3 + 10).alias("le"),
    )
    rdf = spark.range(100).select(
        F.col("id").alias("rid"),
        (F.col("id") * 5).alias("rs"),
        (F.col("id") * 5 + 7).alias("re"),
    )
    out = overlap_join(ldf, rdf, "ls", "le", "rs", "re", bin_width=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan


# ---- bloom ingest membership ---------------------------------------------


def test_bloom_membership_equals_semi_join(spark):
    """The bloom is a pure pruning layer: output == the plain semi-join
    for corpora/batches with hits, misses, and absent keys — at any
    (n_bits, k), including tiny bitmaps with many false positives."""
    from sparkflow_spark.operators import bloom_ingest_membership

    corpus = spark.range(0, 5000, 3).select(F.col("id").alias("uid"))
    inc = spark.range(0, 8000).select(
        F.col("id").alias("uid"), (F.col("id") * 7 % 13).alias("v")
    )
    want = sorted(
        (r["uid"], r["v"]) for r in inc.join(corpus, "uid", "left_semi").collect()
    )
    for n_bits, k in ((1 << 16, 5), (1 << 10, 2)):  # second: FP-heavy on purpose
        got = sorted(
            (r["uid"], r["v"])
            for r in bloom_ingest_membership(
                spark, corpus, inc, "uid", n_bits=n_bits, k=k
            ).collect()
        )
        assert got == want and got, (n_bits, k)


def test_bloom_filter_layout_invariant(spark):
    """The built bitmap is a pure content function — identical bytes
    regardless of partition layout (bitwise_or.at accumulation and the
    driver OR are both order-free)."""
    from sparkflow_spark.operators import build_bloom_filter

    keys = spark.range(0, 3000, 2).select(F.col("id").alias("k"))
    a = build_bloom_filter(keys, "k", n_bits=1 << 14, k=4)
    b = build_bloom_filter(keys.repartition(17), "k", n_bits=1 << 14, k=4)
    assert a == b and any(a)


def test_bloom_membership_plan_broadcasts(spark):
    """Neither join in the verify chain may sort-merge: candidate keys
    and verified keys are batch-sized and must broadcast — the corpus
    is scan-only per batch."""
    from sparkflow_spark.operators import bloom_ingest_membership

    corpus = spark.range(0, 2000).select(F.col("id").alias("uid"))
    inc = spark.range(0, 100).select(F.col("id").alias("uid"))
    out = bloom_ingest_membership(spark, corpus, inc, "uid", n_bits=1 << 14)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_hll_daily_union_is_lossless(spark):
    """The property that makes a persisted daily-sketch table
    trustworthy: HLL merge is lossless — the union of per-day sketches
    estimates EXACTLY what a single-pass sketch over the same rows
    estimates, and the build is split-invariant."""
    rows = [(d, u) for d in range(10) for u in range((d * 37) % 200 + 50)]
    df = spark.createDataFrame(rows, "d int, u long")
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("u", 14)).alias("e")
    ).collect()[0]["e"]
    daily = df.groupBy("d").agg(F.hll_sketch_agg("u", 14).alias("sk"))
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")
    ).collect()[0]["e"]
    assert merged == direct
    # split-merge invariance: sketch table built from two halves unions
    # to the same estimate
    lo = df.where(F.col("d") < 5).groupBy("d").agg(F.hll_sketch_agg("u", 14).alias("sk"))
    hi = df.where(F.col("d") >= 5).groupBy("d").agg(F.hll_sketch_agg("u", 14).alias("sk"))
    merged2 = lo.unionByName(hi).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")
    ).collect()[0]["e"]
    assert merged2 == direct
