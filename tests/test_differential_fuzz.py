"""Random-query differential fuzzing (SQLancer-lite): a seeded generator
emits query ASTs over lineitem/orders and lowers each AST BOTH to a
DataFrame plan and to DuckDB SQL, then hash-compares the results — the
same oracle gate as the contract queries, but over a query space nobody
hand-picked. Catches cross-engine semantic drift (null handling, type
coercion, predicate edge cases) that fixed test queries can miss.

Contract discipline mirrors SCALE.md "numeric determinism": aggregates
over doubles are quantized to integer cents per row before SUM (exact,
order-independent); MIN/MAX stay double (they select an input value, no
accumulation); COUNT family is integer-exact.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from sparkflow_spark.catalog import Tables
from sparkflow_spark.oracle import compare, duckdb_connection

N_QUERIES = 40
SEED = 20260813


def _pred(rng: random.Random):
    kind = rng.choice(["qty", "disc", "flag", "date", "tax", "key"])
    if kind == "qty":
        c = rng.randint(1, 50)
        return F.col("l_quantity") < c, f"l_quantity < {c}"
    if kind == "disc":
        a = round(rng.uniform(0.0, 0.05), 3)
        b = round(a + rng.uniform(0.0, 0.05), 3)
        return (
            F.col("l_discount").between(a, b),
            f"l_discount BETWEEN {a} AND {b}",
        )
    if kind == "flag":
        subset = rng.sample(["A", "N", "R"], rng.randint(1, 2))
        inlist = ", ".join(f"'{s}'" for s in subset)
        return F.col("l_returnflag").isin(subset), f"l_returnflag IN ({inlist})"
    if kind == "date":
        lit = f"{rng.randint(1995, 2000)}-{rng.randint(1, 12):02d}-01 00:00:00"
        return (
            F.col("l_shipdate") < F.lit(lit).cast("timestamp"),
            f"l_shipdate < TIMESTAMP '{lit}'",
        )
    if kind == "tax":
        c = round(rng.uniform(0.0, 0.08), 3)
        return F.col("l_tax") >= c, f"l_tax >= {c}"
    c = rng.randint(1, 6000)
    return F.col("l_orderkey") % 7 < c % 7 + 1, f"l_orderkey % 7 < {c % 7 + 1}"


def _filter(rng: random.Random):
    n = rng.randint(1, 3)
    parts = [_pred(rng) for _ in range(n)]
    op = rng.choice(["AND", "OR"])
    col, sql = parts[0]
    for c2, s2 in parts[1:]:
        col = (col & c2) if op == "AND" else (col | c2)
        sql = f"({sql}) {op} ({s2})"
    return col, sql


_CENTS = "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)"
_AGGS = [
    (
        lambda: F.count(F.lit(1)).alias("cnt"),
        "COUNT(*) AS cnt",
    ),
    (
        lambda: F.sum(
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("s_cents"),
        f"CAST(SUM({_CENTS}) AS BIGINT) AS s_cents",
    ),
    (
        lambda: F.min("l_quantity").alias("min_q"),
        "MIN(l_quantity) AS min_q",
    ),
    (
        lambda: F.max("l_tax").alias("max_t"),
        "MAX(l_tax) AS max_t",
    ),
    (
        lambda: F.countDistinct("l_orderkey").alias("d_ord"),
        "COUNT(DISTINCT l_orderkey) AS d_ord",
    ),
]


def _one(rng: random.Random, t: Tables):
    fcol, fsql = _filter(rng)
    keys = rng.choice([[], ["l_returnflag"], ["l_returnflag", "l_linestatus"]])
    aggs = rng.sample(_AGGS, rng.randint(1, 3))
    joined = rng.random() < 0.4

    df = t.lineitem
    frm = "lineitem"
    if joined:
        df = df.join(t.orders, df.l_orderkey == t.orders.o_orderkey)
        frm = "lineitem JOIN orders ON l_orderkey = o_orderkey"
        if keys == []:
            keys = ["o_orderpriority"]
    df = df.filter(fcol)
    spark_aggs = [mk() for mk, _ in aggs]
    sql_aggs = ", ".join(s for _, s in aggs)
    if keys:
        sdf = df.groupBy(*keys).agg(*spark_aggs)
        ksql = ", ".join(keys)
        sql = f"SELECT {ksql}, {sql_aggs} FROM {frm} WHERE {fsql} GROUP BY {ksql}"
    else:
        sdf = df.agg(*spark_aggs)
        sql = f"SELECT {sql_aggs} FROM {frm} WHERE {fsql}"
    return sdf, sql


def test_random_query_differential(spark, sf_dir):
    rng = random.Random(SEED)
    t = Tables(spark, sf_dir)
    con = duckdb_connection(sf_dir)
    failures = []
    for i in range(N_QUERIES):
        sdf, sql = _one(rng, t)
        r = compare(f"fuzz_{i}", sdf, sql, con)
        if not r.match:
            failures.append(f"fuzz_{i}: {r.detail[:200]}\n  SQL: {sql}")
    assert not failures, "\n".join(failures)
