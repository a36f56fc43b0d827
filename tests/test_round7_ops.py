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
    parquet write under the warehouse dir. Sole exceptions: the two
    probe-bounded index-lookup wrappers (IVF / LSH query results are
    |probes|-bounded, not data-scaled)."""
    import pathlib

    qdir = pathlib.Path(__file__).resolve().parent.parent / "sparkflow_spark" / "queries"
    allowed = {"dedup_suite.py": 1, "similarity_suite.py": 1}
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
