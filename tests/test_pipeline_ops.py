"""Behavioral tests for the pipeline_suite operators: PII redaction,
contamination, column profiling, unigram scoring. The cross-engine hash
checks live in the oracle sweep; these pin the operator semantics on
crafted micro-inputs where the expected answer is computable by hand."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from sparkflow_spark import dedup
from sparkflow_spark.functions.text import redact_pii
from sparkflow_spark.operators import profile


def test_redact_pii_patterns(spark):
    df = spark.createDataFrame(
        [
            ("mail me at bob.smith+x@corp.example.org today",),
            ("see https://example.com/a?b=c#frag and http://x.io",),
            ("call 555-010-1234 now",),
            ("card 4111111111111111 leaked",),
            ("clean text with no pii at all",),
            ("two mails a@b.co c@d.org",),
        ],
        ["text"],
    )
    got = [r[0] for r in df.select(redact_pii("text")).collect()]
    assert got[0] == "mail me at <EMAIL> today"
    assert got[1] == "see <URL> and <URL>"
    assert got[2] == "call <PHONE> now"
    assert got[3] == "card <ID> leaked"
    assert got[4] == "clean text with no pii at all"
    assert got[5] == "two mails <EMAIL> <EMAIL>"


def test_redact_pii_null_safe(spark):
    df = spark.createDataFrame([(None,)], "text string")
    assert df.select(redact_pii("text")).first()[0] is None


def test_contamination_hand_checked(spark):
    # eval doc 0: shingles {a b c, b c d} — "a b c" occurs in train,
    # "b c d" does not → 1/2. eval doc 2: fully contained → 1.0.
    train = spark.createDataFrame(
        [(10, "a b c x y z"), (11, "p q r s")], ["doc_id", "text"]
    )
    ev = spark.createDataFrame(
        [(0, "a b c d"), (2, "x y z")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in dedup.ngram_contamination(train, ev, shingle_k=3).collect()
    }
    assert out[0]["n_shingles"] == 2 and out[0]["n_hits"] == 1
    assert out[0]["contamination"] == 0.5
    assert out[2]["n_shingles"] == 1 and out[2]["contamination"] == 1.0


def test_contamination_short_doc_fallback(spark):
    # docs shorter than k collapse to one whole-text shingle (same
    # fallback as the jaccard path) — no crash, sane fraction
    train = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    ev = spark.createDataFrame([(0, "hello world"), (4, "bye")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in dedup.ngram_contamination(train, ev).collect()}
    assert out[0]["contamination"] == 1.0
    assert out[4]["contamination"] == 0.0


def test_profile_metrics(spark):
    df = spark.createDataFrame(
        [(1.0, "a"), (3.0, "b"), (None, "a"), (2.0, None)],
        "x double, s string",
    )
    rows = {r["column_name"]: r for r in profile(df, ["x", "s"]).collect()}
    x = rows["x"]
    assert x["n_rows"] == 4 and x["n_nulls"] == 1 and x["n_distinct"] == 3
    assert x["min_d"] == 1.0 and x["max_d"] == 3.0 and abs(x["mean_d"] - 2.0) < 1e-12
    s = rows["s"]
    # strings: try_cast → NULL numeric stats, counts still exact
    assert s["n_nulls"] == 1 and s["n_distinct"] == 2
    assert s["min_d"] is None and s["max_d"] is None and s["mean_d"] is None


def test_profile_single_scan(spark, sf_dir):
    """The whole profile is ONE aggregation over ONE scan: the physical
    plan must contain exactly one parquet scan (Expand handles the
    multi-distinct), not one scan per column."""
    from sparkflow_spark.catalog import Tables

    t = Tables(spark, sf_dir)
    plan = (
        profile(t.lineitem, ["l_quantity", "l_extendedprice", "l_returnflag"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan parquet") + plan.count("Scan parquet") <= 2  # AQE may print twice
    assert "Expand" in plan


def test_unigram_logprob_hand_checked(spark, sf_dir):
    # corpus: "a a b" + "a" → counts a=3, b=1, total=4
    df = spark.createDataFrame([(0, "a a b"), (1, "a")], ["doc_id", "text"])
    df.createOrReplaceTempView("_unigram_docs")
    toks = df.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("s"))
    out = {
        r["doc_id"]: r["lp"]
        for r in toks.join(F.broadcast(vocab), "tok")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(F.avg(F.log(F.col("c") / F.col("s"))).alias("lp"))
        .collect()
    }
    exp0 = (2 * math.log(3 / 4) + math.log(1 / 4)) / 3
    assert abs(out[0] - exp0) < 1e-9
    assert abs(out[1] - math.log(3 / 4)) < 1e-9


def test_merge_upsert_semantics(spark):
    from sparkflow_spark.operators import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "s", "v"]
    )
    source = spark.createDataFrame(
        [(2, "B", 99.0, False), (3, "c", 30.0, True), (4, "d", 40.0, False)],
        ["k", "s", "v", "_del"],
    )
    out = {
        r["k"]: (r["s"], r["v"])
        for r in merge_upsert(target, source, ["k"], delete_col="_del").collect()
    }
    assert out == {1: ("a", 10.0), 2: ("B", 99.0), 4: ("d", 40.0)}  # 3 deleted


def test_merge_upsert_no_delete_col(spark):
    from sparkflow_spark.operators import merge_upsert

    target = spark.createDataFrame([(1, 1.0)], ["k", "v"])
    source = spark.createDataFrame([(1, 2.0), (2, 3.0)], ["k", "v"])
    out = {r["k"]: r["v"] for r in merge_upsert(target, source, ["k"]).collect()}
    assert out == {1: 2.0, 2: 3.0}


def test_sessionize_boundaries(spark):
    import datetime as dt

    from sparkflow_spark.operators import sessionize

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base),
        (1, base + dt.timedelta(minutes=10)),       # same session
        (1, base + dt.timedelta(minutes=50)),       # gap 40 > 30 → new
        (2, base),                                   # other user independent
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = sessionize(df, gap_minutes=30).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 2
    sizes = sorted(r["n_events"] for r in by_user[1])
    assert sizes == [1, 2]
    assert len(by_user[2]) == 1 and by_user[2][0]["n_events"] == 1


def test_sessionize_single_exchange(spark, sf_dir):
    """Both windows + the rollup share the (user) partitioning: exactly
    one shuffle exchange in the physical plan."""
    from sparkflow_spark.catalog import Tables
    from sparkflow_spark.operators import sessionize

    t = Tables(spark, sf_dir)
    plan = (
        sessionize(t.events, "user_id", "ts", 360)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan[:2000]


def test_gap_fill_ffill_semantics(spark):
    import datetime as dt

    from sparkflow_spark.operators import gap_fill_ffill

    b = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        (1, b, 10),                                # 00:xx → bucket 00
        (1, b + dt.timedelta(hours=3), 5),         # 03:xx; 01,02 gaps
        (1, b + dt.timedelta(hours=3, minutes=10), 7),  # same bucket 03
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    out = {
        r["grid_ts"].hour: r["v"]
        for r in gap_fill_ffill(df, "k", "ts", "v").collect()
    }
    assert out == {0: 10, 1: 10, 2: 10, 3: 12}  # gaps carry 10; 03 sums 5+7


def test_gap_fill_rejects_unknown_step(spark):
    import pytest

    from sparkflow_spark.operators import gap_fill_ffill

    df = spark.createDataFrame([(1, None, 1)], "k int, ts timestamp, v int")
    with pytest.raises(ValueError, match="step"):
        gap_fill_ffill(df, "k", "ts", "v", step="17 seconds")


# ---------------------------------------------------------------------------
# property tests: merge_upsert vs a python reference; sessionize vs a
# python reference (hypothesis-generated inputs)

from hypothesis import given, settings, strategies as st


@settings(max_examples=15, deadline=None)
@given(
    tgt=st.lists(
        st.tuples(st.integers(0, 9), st.integers(-100, 100)),
        max_size=12,
        unique_by=lambda r: r[0],
    ),
    src=st.lists(
        st.tuples(st.integers(0, 9), st.integers(-100, 100), st.booleans()),
        max_size=12,
        unique_by=lambda r: r[0],
    ),
)
def test_merge_upsert_property(spark, tgt, src):
    from sparkflow_spark.operators import merge_upsert

    target = spark.createDataFrame(tgt, "k int, v int") if tgt else spark.createDataFrame(
        [], "k int, v int"
    )
    source = (
        spark.createDataFrame(src, "k int, v int, _del boolean")
        if src
        else spark.createDataFrame([], "k int, v int, _del boolean")
    )
    got = {
        r["k"]: r["v"]
        for r in merge_upsert(target, source, ["k"], delete_col="_del").collect()
    }
    exp = {k: v for k, v in tgt}
    for k, v, dele in src:
        if dele:
            exp.pop(k, None)
        else:
            exp[k] = v
    assert got == exp


@settings(max_examples=15, deadline=None)
@given(
    evs=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 500)),  # (user, minute)
        min_size=1,
        max_size=20,
    )
)
def test_sessionize_property(spark, evs):
    """Session count and per-session event totals match a sequential
    python reference for arbitrary event layouts (30-min gap)."""
    import datetime as dt

    from sparkflow_spark.operators import sessionize

    base = dt.datetime(2024, 1, 1)
    rows = [(u, base + dt.timedelta(minutes=m)) for u, m in evs]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = sessionize(df, gap_minutes=30).collect()

    # python reference
    exp_sessions = {}
    for u in {u for u, _ in evs}:
        ms = sorted(m for uu, m in evs if uu == u)
        sess = []
        for m in ms:
            if not sess or m - sess[-1][-1] > 30:
                sess.append([m])
            else:
                sess[-1].append(m)
        exp_sessions[u] = sess
    got_by_user = {}
    for r in out:
        got_by_user.setdefault(r["user_id"], []).append(r)
    for u, sess in exp_sessions.items():
        got = sorted(got_by_user[u], key=lambda r: r["session_start"])
        assert len(got) == len(sess), (u, sess)
        for g, s in zip(got, sess):
            assert g["n_events"] == len(s)
            assert g["session_start"] == base + dt.timedelta(minutes=s[0])
            assert g["session_end"] == base + dt.timedelta(minutes=s[-1])


# ---------------------------------------------------------------------------
# round-5b additions: chunking, table diff, SCD2


def test_chunk_documents_boundaries(spark):
    """Exact-fit docs make one chunk; one-past-fit makes two; overlap
    region repeats stride..chunk_tokens tokens; empty docs are dropped."""
    from sparkflow_spark.operators import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(64))),   # exactly chunk_tokens
            (2, " ".join(f"t{i}" for i in range(65))),   # one past → 2 chunks
            (3, "a b c"),                                  # tiny → 1 chunk of 3
            (4, "   "),                                    # whitespace-only → dropped
            (5, ""),                                       # empty → dropped
        ],
        ["doc_id", "text"],
    )
    out = chunk_documents(docs, chunk_tokens=64, stride=48)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    assert {(1, 0), (2, 0), (2, 1), (3, 0)} == set(rows)
    assert rows[(1, 0)]["n_tokens"] == 64
    assert rows[(2, 0)]["n_tokens"] == 64
    # second window starts at token 48 → 65-48 = 17 tokens, ragged tail
    assert rows[(2, 1)]["n_tokens"] == 17
    c0 = rows[(2, 0)]["chunk_text"].split(" ")
    c1 = rows[(2, 1)]["chunk_text"].split(" ")
    assert c1[0] == "t48" and c0[48:] == c1[:16]  # 16-token overlap
    assert rows[(3, 0)]["chunk_text"] == "a b c"


def test_chunk_documents_rejects_bad_params(spark):
    from sparkflow_spark.operators import chunk_documents

    docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    for kw in ({"stride": 0}, {"chunk_tokens": 0}, {"stride": -1}):
        try:
            chunk_documents(docs, **kw)
            assert False, f"expected ValueError for {kw}"
        except ValueError:
            pass


def test_table_diff_classification(spark):
    """added/removed/changed classification with NULL-safe compares:
    NULL==NULL is identical (dropped), NULL vs value is changed."""
    from sparkflow_spark.operators import table_diff

    tgt = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, None, 40.0)],
        "k long, name string, bal double",
    )
    src = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 31.0), (5, "e", 50.0),
         (4, "now-set", 40.0)],
        "k long, name string, bal double",
    )
    out = {r["k"]: r for r in table_diff(tgt, src, keys=["k"]).collect()}
    assert set(out) == {3, 4, 5}          # 1 identical, 2 NULL==NULL identical
    assert out[3]["diff_kind"] == "changed" and out[3]["changed_bal"]
    assert not out[3]["changed_name"]
    assert out[4]["diff_kind"] == "changed" and out[4]["changed_name"]
    assert out[5]["diff_kind"] == "added"
    removed = table_diff(src, tgt, keys=["k"]).collect()
    assert {r["k"]: r["diff_kind"] for r in removed}[5] == "removed"


def test_scd2_collapses_runs_and_closes_intervals(spark):
    """Consecutive equal attribute values collapse to one interval;
    intervals chain valid_from → next change; only the last row per key
    is current; NULL attribute runs collapse too (NULL-safe lag)."""
    import datetime as dt

    from sparkflow_spark.operators import scd2_from_changes

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, "x", base, 1),
        (1, "x", base + dt.timedelta(hours=1), 2),   # same run
        (1, "y", base + dt.timedelta(hours=2), 3),   # change
        (1, "y", base + dt.timedelta(hours=3), 4),
        (1, "x", base + dt.timedelta(hours=4), 5),   # back to x = new interval
        (2, None, base, 6),
        (2, None, base + dt.timedelta(hours=1), 7),  # NULL run collapses
        (2, "z", base + dt.timedelta(hours=2), 8),
    ]
    df = spark.createDataFrame(rows, "user_id long, attr string, ts timestamp, event_id long")
    out = scd2_from_changes(df, "user_id", "attr", "ts", tiebreak_col="event_id")
    got = sorted(out.collect(), key=lambda r: (r["user_id"], r["valid_from"]))
    u1 = [r for r in got if r["user_id"] == 1]
    assert [(r["attr"], r["is_current"]) for r in u1] == [
        ("x", False), ("y", False), ("x", True)]
    assert u1[0]["valid_to"] == u1[1]["valid_from"] == base + dt.timedelta(hours=2)
    assert u1[1]["valid_to"] == u1[2]["valid_from"] == base + dt.timedelta(hours=4)
    assert u1[2]["valid_to"] is None
    u2 = [r for r in got if r["user_id"] == 2]
    assert [(r["attr"], r["is_current"]) for r in u2] == [(None, False), ("z", True)]


def test_sample_k_per_group_exact_and_deterministic(spark):
    """Every group yields exactly min(k, |group|) rows; the selection is
    identical across invocations (hash-based, no RNG state)."""
    from sparkflow_spark.operators import sample_k_per_group

    rows = [(g, g * 100 + i) for g in range(4) for i in range(g + 1)]  # sizes 1..4
    df = spark.createDataFrame(rows, "g int, id long")
    out1 = sample_k_per_group(df, "g", 3, key_cols=["id"], seed=7)
    got = {}
    for r in out1.collect():
        got.setdefault(r["g"], set()).add(r["id"])
    assert {g: len(ids) for g, ids in got.items()} == {0: 1, 1: 2, 2: 3, 3: 3}
    again = {}
    for r in sample_k_per_group(df, "g", 3, key_cols=["id"], seed=7).collect():
        again.setdefault(r["g"], set()).add(r["id"])
    assert got == again
    other = {}
    for r in sample_k_per_group(df, "g", 3, key_cols=["id"], seed=8).collect():
        other.setdefault(r["g"], set()).add(r["id"])
    assert other[3] != got[3] or other[2] != got[2]  # seed moves the sample


def test_sample_weighted_prefers_heavy_and_guards_domain(spark):
    """A-ES weighted sampling: weight-100 items crowd out weight-0.01
    items; NULL/non-positive weights never appear; k<=0 raises."""
    from sparkflow_spark.operators import sample_k_per_group

    rows = [(0, i, 100.0 if i < 5 else 0.01) for i in range(40)]
    rows += [(0, 98, None), (0, 99, -1.0)]
    df = spark.createDataFrame(rows, "g int, id long, w double")
    heavy = light = 0
    for seed in range(5):
        ids = {r["id"] for r in
               sample_k_per_group(df, "g", 5, key_cols=["id"], seed=seed,
                                  weight_col="w").collect()}
        assert not ids & {98, 99}
        heavy += len([i for i in ids if i < 5])
        light += len([i for i in ids if 5 <= i < 40])
    assert heavy >= 20, (heavy, light)  # 25 picks total across 5 seeds
    try:
        sample_k_per_group(df, "g", 0, key_cols=["id"])
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_triangle_counts_known_graph(spark):
    """K4 minus an edge has 2 triangles: nodes on the shared edge sit in
    both, the others in one; orientation/dup/self-loop input noise is
    canonicalized away."""
    from sparkflow_spark.graph import triangle_counts

    edges = [(1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (2, 4), (3, 3)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    # triangles: {1,2,3} and {1,2,4}; edge 3-4 absent so no {1,3,4}/{2,3,4}/{3,4,x}
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}


def test_hash_split_stable_under_growth(spark):
    """The leakage property: a row's split assignment is unchanged when
    the corpus grows (pure function of id+seed), fractions land near
    their targets, and bad fractions raise."""
    from sparkflow_spark.operators import hash_split

    small = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    fr = {"train": 0.8, "test": 0.2}
    s1 = {r["doc_id"]: r["split"] for r in hash_split(small, "doc_id", fr).collect()}
    s2 = {r["doc_id"]: r["split"] for r in hash_split(big, "doc_id", fr).collect()}
    assert all(s2[k] == v for k, v in s1.items())  # growth never reassigns
    n_test = sum(1 for v in s2.values() if v == "test")
    assert 0.14 <= n_test / 2000 <= 0.26  # binomial-loose around 0.20
    for bad in ({}, {"a": -0.1}, {"a": 0.7, "b": 0.5}):
        try:
            hash_split(small, "doc_id", bad)
            assert False, f"expected ValueError for {bad}"
        except ValueError:
            pass
    three = hash_split(small, "doc_id", {"a": 0.5, "b": 0.3, "c": 0.2})
    counts = {r["split"]: 1 for r in three.collect()}
    assert set(counts) == {"a", "b", "c"}


def test_round5c_operator_edge_guards(spark):
    """Edge hardening: NULL ids get NULL split (not a silent bucket),
    keys-only table_diff / empty key_cols / empty checksum cols raise,
    NULL vectors are dropped by the IVF append path."""
    from sparkflow_spark.operators import (
        hash_split,
        sample_k_per_group,
        table_checksum,
        table_diff,
    )

    df = spark.createDataFrame([(1,), (None,)], "doc_id long")
    out = {r["doc_id"]: r["split"] for r in
           hash_split(df, "doc_id", {"train": 0.8, "test": 0.2}).collect()}
    assert out[1] in ("train", "test") and out[None] is None
    kv = spark.createDataFrame([(1, 2.0)], "k long, v double")
    for bad_call in (
        lambda: table_diff(kv.select("k"), kv.select("k"), keys=["k"]),
        lambda: sample_k_per_group(kv, "k", 1, key_cols=[]),
        lambda: table_checksum(kv, []),
    ):
        try:
            bad_call()
            assert False, "expected ValueError"
        except ValueError:
            pass


def test_ivf_append_drops_null_vectors(spark, tmp_path):
    import numpy as np

    from sparkflow_spark.vector_index import append_to_ivf_index, build_ivf_index

    rng = np.random.default_rng(1)
    vecs = spark.createDataFrame(
        [(i, rng.normal(0, 1, 8).astype("float32").tolist()) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "idx")
    build_ivf_index(vecs, path, n_centroids=2)
    withnull = spark.createDataFrame(
        [(100, rng.normal(0, 1, 8).astype("float32").tolist()), (101, None)],
        "vec_id long, embedding array<float>",
    )
    append_to_ivf_index(spark, path, withnull)
    ids = {r["id"] for r in spark.read.parquet(path + "/cells").select("id").collect()}
    assert 100 in ids and 101 not in ids and len(ids) == 31


def test_table_diff_null_key_classification(spark):
    """NULL keys match via eqNullSafe and must classify by PRESENCE,
    not key nullity: identical NULL-key rows drop, a NULL-key row only
    in the target is 'removed', changed NULL-key rows are 'changed'."""
    from sparkflow_spark.operators import table_diff

    tgt = spark.createDataFrame(
        [(None, "same"), (1, "only-in-target")], "k long, v string"
    )
    src = spark.createDataFrame([(None, "same")], "k long, v string")
    out = table_diff(tgt, src, keys=["k"]).collect()
    assert len(out) == 1 and out[0]["k"] == 1 and out[0]["diff_kind"] == "removed"
    src2 = spark.createDataFrame([(None, "CHANGED")], "k long, v string")
    out2 = table_diff(tgt.where(F.col("k").isNull()), src2, keys=["k"]).collect()
    assert len(out2) == 1 and out2[0]["diff_kind"] == "changed"


def test_chunk_documents_gapped_sampling_no_empty_tail(spark):
    """stride > chunk_tokens (gapped sampling) must not emit an empty
    trailing chunk when the final start lands exactly at n."""
    from sparkflow_spark.operators import chunk_documents

    doc = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(100)))], ["doc_id", "text"]
    )
    rows = chunk_documents(doc, chunk_tokens=10, stride=50).collect()
    got = {(r["chunk_id"]): (r["n_tokens"], r["chunk_text"].split(" ")[0]) for r in rows}
    assert got == {0: (10, "t0"), 1: (10, "t50")}  # no (2, 0, '') row
    assert all(r["n_tokens"] > 0 for r in rows)


def test_lsh_index_rejects_bad_bands(spark, tmp_path):
    from sparkflow_spark.lsh_index import build_lsh_index

    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    for bands in (0, 12, 100):
        try:
            build_lsh_index(docs, str(tmp_path / f"i{bands}"), bands=bands)
            assert False, f"expected ValueError for bands={bands}"
        except ValueError:
            pass


def test_assert_schema_contract(spark):
    """Schema gate: pass-through on match; every violation named; extra
    columns tolerated only under allow_extra."""
    from sparkflow_spark.operators import assert_schema

    df = spark.createDataFrame([(1, "a", 2.0)], "id long, name string, x double")
    assert assert_schema(df, "id long, name string, x double") is df
    assert assert_schema(df, "id long, name string", allow_extra=True) is df
    try:
        assert_schema(df, "id int, name string, y double")
        assert False, "expected ValueError"
    except ValueError as e:
        msg = str(e)
        assert "expected int, got bigint" in msg
        assert "missing column 'y'" in msg
        assert "unexpected column 'x'" in msg


def test_assert_schema_flags_duplicate_columns(spark):
    """A join can legally produce duplicate-named columns — the gate
    must fail them, not let dict-keying collapse the duplicates."""
    from sparkflow_spark.operators import assert_schema

    a = spark.createDataFrame([(1, "x")], "id long, v string")
    b = spark.createDataFrame([(1, "y")], "id long, w string")
    dup = a.join(b, a["id"] == b["id"])  # two 'id' columns
    try:
        assert_schema(dup, "id long, v string, w string", allow_extra=True)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "duplicate column 'id'" in str(e)


def test_quarantine_does_not_mutate_caller_schema(spark, tmp_path):
    import pyspark.sql.types as T

    from sparkflow_spark.sources import read_json_with_quarantine

    p = tmp_path / "x.json"
    p.write_text('{"id": 1}\nnot-json\n')
    schema = T.StructType([T.StructField("id", T.LongType())])
    for _ in range(2):  # a second call must not see a grafted field
        clean, quarantine = read_json_with_quarantine(spark, str(p), schema)
        assert clean.columns == ["id"] and quarantine.count() == 1
    assert [f.name for f in schema.fields] == ["id"]


def test_label_propagation_ignores_self_loops(spark):
    """A self-loop edge must not double a node's self vote: with edge
    (2,2) present, node 2 still ties 1-vs-2 on the (1,2) bridge and
    adopts the smaller label — the documented rule."""
    from sparkflow_spark.graph import label_propagation

    df = spark.createDataFrame([(1, 2), (2, 2)], "a long, b long")
    got = {r["node"]: r["community"] for r in label_propagation(df).collect()}
    assert got == {1: 1, 2: 1}


def test_md5_uniform_matches_duckdb_exactly(spark):
    """The cross-engine determinism primitive, pinned directly: 200
    variates computed by Spark equal DuckDB's bit for bit."""
    import duckdb

    from sparkflow_spark.operators import md5_uniform

    df = spark.range(0, 200).select(
        F.col("id"), md5_uniform(F.col("id"), ":pin").alias("u")
    )
    got = {r["id"]: r["u"] for r in df.collect()}
    con = duckdb.connect()
    want = dict(
        con.execute(
            "SELECT i, ('0x' || substr(md5(CAST(i AS VARCHAR) || ':pin'), 1, 8))::UBIGINT"
            " / 4294967296.0 FROM range(200) t(i)"
        ).fetchall()
    )
    assert got == want  # exact float equality, no tolerance


def test_chunk_documents_reconstruction_property(spark):
    """Coverage property: for stride <= chunk_tokens, concatenating the
    first `stride` tokens of every chunk plus the tail of the last
    chunk reproduces the document exactly (no token lost or duplicated
    beyond the declared overlap)."""
    from sparkflow_spark.operators import chunk_documents

    for n in (1, 47, 48, 64, 65, 100, 112, 113, 200):
        toks = [f"t{i}" for i in range(n)]
        df = spark.createDataFrame([(1, " ".join(toks))], ["doc_id", "text"])
        rows = sorted(
            chunk_documents(df, chunk_tokens=64, stride=48).collect(),
            key=lambda r: r["chunk_id"],
        )
        rebuilt = []
        for i, r in enumerate(rows):
            ctoks = r["chunk_text"].split(" ")
            rebuilt += ctoks if i == len(rows) - 1 else ctoks[:48]
        # the final chunk may re-cover up to (chunk-stride) tokens the
        # previous chunk already contributed — dedupe the seam
        assert rebuilt[-len(toks):] == toks or rebuilt == toks, n
        # and every token index is covered at least once
        covered = set()
        for r in rows:
            start = r["chunk_id"] * 48
            covered.update(range(start, start + r["n_tokens"]))
        assert covered == set(range(n)), n


def test_table_checksum_canonical_form_is_injective(spark):
    """Round-6 advice fix: the length-prefixed field encoding makes
    rows containing the separator or a NULL-lookalike value distinct —
    ('a|b','c') vs ('a','b|c'), and NULL vs the literal strings 'N' /
    '<NULL>', must all checksum differently."""
    from sparkflow_spark.operators import table_checksum

    def ck(rows):
        df = spark.createDataFrame(rows, "x string, y string")
        return table_checksum(df, ["x", "y"]).collect()[0]["checksum"]

    assert ck([("a|b", "c")]) != ck([("a", "b|c")])
    assert ck([(None, "c")]) != ck([("N", "c")])
    assert ck([(None, "c")]) != ck([("<NULL>", "c")])
    assert ck([("1:a", "c")]) != ck([("1", ":a|c")])
    # order independence still holds
    assert ck([("a", "b"), ("c", "d")]) == ck([("c", "d"), ("a", "b")])
