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
import pytest
from pyspark.sql import Window

from sparkflow_spark.catalog import Tables
from sparkflow_spark.oracle import compare, duckdb_connection

N_QUERIES = 80
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
    # REGR family (round-6e surface): moment-based, partial-aggregable;
    # rounded like the q99 registry entry so cross-engine accumulation
    # order stays below the grain
    (
        lambda: (
            F.round(
                F.regr_slope(
                    F.col("l_extendedprice").cast("double"),
                    F.col("l_quantity").cast("double"),
                ),
                4,
            ).cast("double")
            + F.lit(0.0)
        ).alias("r_slope"),
        "CAST(ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS DOUBLE) + 0.0 AS r_slope",
    ),
    (
        lambda: (
            F.round(
                F.corr(
                    F.col("l_quantity").cast("double"),
                    F.col("l_discount").cast("double"),
                ),
                6,
            ).cast("double")
            + F.lit(0.0)
        ).alias("r_corr"),
        "CAST(ROUND(corr(l_quantity, l_discount), 6) AS DOUBLE) + 0.0 AS r_corr",
    ),
]


def _outer_join(rng: random.Random, t: Tables):
    """LEFT/FULL outer join with a probe-side condition in the ON clause
    (the shape that actually produces unmatched NULL rows), aggregated
    with null-skipping vs null-counting aggregates."""
    how = rng.choice(["left", "full"])
    cutoff = rng.randint(50_000, 250_000)
    cond_sql = f"l_orderkey = o_orderkey AND o_totalprice > {cutoff}"
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("o_totalprice") > cutoff
    )
    df = t.lineitem.join(t.orders, cond, how).groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderkey").alias("n_matched"),
        F.countDistinct("o_orderpriority").alias("d_pri"),
    )
    sql = (
        "SELECT l_returnflag, COUNT(*) AS n_rows, COUNT(o_orderkey) AS n_matched, "
        "COUNT(DISTINCT o_orderpriority) AS d_pri "
        f"FROM lineitem {'LEFT' if how == 'left' else 'FULL'} JOIN orders "
        f"ON {cond_sql} GROUP BY l_returnflag"
    )
    if how == "full":
        # unmatched orders rows carry NULL l_returnflag — a group both
        # engines must agree on
        pass
    return df, sql


def _window_frame(rng: random.Random, t: Tables):
    """ROWS-frame running aggregates per order. The frame sum rides tied
    sort keys, so the summed value joins the ORDER BY (q21's determinism
    rule: tied rows then carry equal addends and the output multiset is
    order-independent)."""
    prec = rng.choice([None, 1, 3])  # None = UNBOUNDED PRECEDING
    fn, fn_sql = rng.choice(
        [(F.sum, "SUM"), (F.min, "MIN"), (F.max, "MAX"), (F.count, "COUNT")]
    )
    lo = Window.unboundedPreceding if prec is None else -prec
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "cents")
        .rowsBetween(lo, Window.currentRow)
    )
    frame_sql = (
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
        if prec is None
        else f"ROWS BETWEEN {prec} PRECEDING AND CURRENT ROW"
    )
    base = t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    df = base.select(
        "l_orderkey", "l_linenumber", "cents", fn("cents").over(w).cast("bigint").alias("w_val")
    )
    sql = (
        f"SELECT l_orderkey, l_linenumber, {_CENTS} AS cents, "
        f"CAST({fn_sql}({_CENTS}) OVER (PARTITION BY l_orderkey "
        f"ORDER BY l_linenumber, {_CENTS} {frame_sql}) AS BIGINT) AS w_val "
        "FROM lineitem"
    )
    return df, sql


def _hof(rng: random.Random, t: Tables):
    """Higher-order functions over the embedding arrays, integer-
    quantized per element before any fold so the comparison is exact
    and order-independent."""
    kind = rng.choice(["sum_sq", "count_over", "exists", "minmax"])
    scale = rng.choice([100, 1000])
    thr = round(rng.uniform(-0.5, 0.5), 2)
    q = f"CAST(FLOOR(x * {scale} + 0.5) AS BIGINT)"
    if kind == "sum_sq":
        df = t.embeddings.select(
            "vec_id",
            F.aggregate(
                F.transform(
                    "embedding",
                    lambda x: (F.floor(x * scale + F.lit(0.5)).cast("bigint")) ** 2,
                ).cast("array<bigint>"),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias("v"),
        )
        sql = (
            f"SELECT vec_id, CAST(list_sum(list_transform(embedding, "
            f"x -> {q} * {q})) AS BIGINT) AS v FROM embeddings"
        )
    elif kind == "count_over":
        df = t.embeddings.select(
            "vec_id",
            F.size(F.filter("embedding", lambda x: x > thr)).cast("bigint").alias("v"),
        )
        sql = (
            f"SELECT vec_id, CAST(len(list_filter(embedding, x -> x > {thr})) "
            "AS BIGINT) AS v FROM embeddings"
        )
    elif kind == "exists":
        df = t.embeddings.select(
            "vec_id",
            F.exists("embedding", lambda x: x > thr).cast("int").alias("v"),
        )
        sql = (
            f"SELECT vec_id, CAST(len(list_filter(embedding, x -> x > {thr})) > 0 "
            "AS INT) AS v FROM embeddings"
        )
    else:
        df = t.embeddings.select(
            "vec_id",
            F.array_max(
                F.transform(
                    "embedding", lambda x: F.floor(x * scale + F.lit(0.5)).cast("bigint")
                )
            ).alias("v"),
        )
        sql = (
            f"SELECT vec_id, CAST(list_max(list_transform(embedding, x -> {q})) "
            "AS BIGINT) AS v FROM embeddings"
        )
    return df, sql


def _exists(rng: random.Random, t: Tables):
    """Correlated [NOT] EXISTS over orders→lineitem — the decorrelation
    corner (Spark rewrites to semi/anti joins; DuckDB plans a mark
    join): inner predicate random, NULL-key behavior and the
    empty-inner edge both exercised."""
    inner_c, inner_s = _pred(rng)
    outer = rng.choice(
        [
            ("o_orderpriority = '1-URGENT'", F.col("o_orderpriority") == "1-URGENT"),
            ("o_totalprice > 150000", F.col("o_totalprice") > 150000),
            ("o_orderstatus = 'F'", F.col("o_orderstatus") == "F"),
        ]
    )
    negate = rng.random() < 0.5
    inner = t.lineitem.filter(inner_c).select("l_orderkey")
    df = (
        t.orders.filter(outer[1])
        .join(
            inner,
            t.orders.o_orderkey == inner.l_orderkey,
            "left_anti" if negate else "left_semi",
        )
        .select("o_orderkey", "o_orderpriority")
    )
    kw = "NOT EXISTS" if negate else "EXISTS"
    sql = (
        f"SELECT o_orderkey, o_orderpriority FROM orders WHERE {outer[0]} "
        f"AND {kw} (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
        f"AND {inner_s})"
    )
    return df, sql


def _setop(rng: random.Random, t: Tables):
    """UNION [ALL] / INTERSECT / EXCEPT of two filtered projections —
    pins the bag-vs-set semantics corner both engines must share."""
    f1c, f1s = _pred(rng)
    f2c, f2s = _pred(rng)
    proj = ["l_returnflag", "l_linestatus"]
    psql = ", ".join(proj)
    a = t.lineitem.filter(f1c).select(*proj)
    b = t.lineitem.filter(f2c).select(*proj)
    op = rng.choice(
        ["UNION", "UNION ALL", "INTERSECT", "EXCEPT",
         "INTERSECT ALL", "EXCEPT ALL"]
    )
    if op == "UNION":
        df = a.union(b).distinct()
    elif op == "UNION ALL":
        df = a.union(b)
    elif op == "INTERSECT":
        df = a.intersect(b)
    elif op == "INTERSECT ALL":
        df = a.intersectAll(b)  # bag: min(count_a, count_b) copies
    elif op == "EXCEPT ALL":
        df = a.exceptAll(b)  # bag: max(count_a - count_b, 0) copies
    else:
        df = a.subtract(b)  # SQL EXCEPT is the DISTINCT set minus
    sql = (
        f"SELECT {psql} FROM lineitem WHERE {f1s} "
        f"{op} SELECT {psql} FROM lineitem WHERE {f2s}"
    )
    return df, sql


def _stringfn(rng: random.Random, t: Tables):
    """String scalar pipeline over documents.text — names differ across
    engines but semantics must not."""
    kind = rng.choice(["slice_upper", "len_trim", "replace_len", "split_first"])
    a = rng.randint(1, 10)
    n = rng.randint(3, 15)
    if kind == "slice_upper":
        df = t.documents.select(
            "doc_id", F.upper(F.substring("text", a, n)).alias("v")
        )
        sql = f"SELECT doc_id, upper(substr(text, {a}, {n})) AS v FROM documents"
    elif kind == "len_trim":
        df = t.documents.select(
            "doc_id", F.length(F.trim(F.col("text"))).cast("bigint").alias("v")
        )
        sql = "SELECT doc_id, CAST(length(trim(text)) AS BIGINT) AS v FROM documents"
    elif kind == "replace_len":
        ch = rng.choice(["a", "e", "t", " "])
        df = t.documents.select(
            "doc_id",
            (F.length("text") - F.length(F.regexp_replace("text", ch, "")))
            .cast("bigint")
            .alias("v"),
        )
        sql = (
            "SELECT doc_id, CAST(length(text) - length(regexp_replace(text, "
            f"'{ch}', '', 'g')) AS BIGINT) AS v FROM documents"
        )
    else:
        df = t.documents.select(
            "doc_id", F.split(F.col("text"), " ").getItem(0).alias("v")
        )
        sql = "SELECT doc_id, string_split(text, ' ')[1] AS v FROM documents"
    return df, sql


def _groupingsets(rng: random.Random, t: Tables):
    """ROLLUP / CUBE over two keys with an exact integer aggregate —
    pins super-aggregate row synthesis and NULL-marker semantics."""
    import pyspark.sql.functions as F

    op = rng.choice(["ROLLUP", "CUBE"])
    keys = ["l_returnflag", "l_linestatus"]
    agg = F.sum(F.col("l_quantity").cast("bigint")).alias("s")
    g = t.lineitem.rollup(*keys) if op == "ROLLUP" else t.lineitem.cube(*keys)
    df = g.agg(agg)
    sql = (
        f"SELECT l_returnflag, l_linestatus, "
        f"CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s "
        f"FROM lineitem GROUP BY {op}(l_returnflag, l_linestatus)"
    )
    return df, sql


def _percentile(rng: random.Random, t: Tables):
    """Exact grouped percentile (continuous interpolation on both
    engines — the X12 rule) at a random quantile."""
    import pyspark.sql.functions as F

    q = rng.choice([0.1, 0.25, 0.5, 0.75, 0.9])
    df = t.lineitem.groupBy("l_returnflag").agg(
        (F.round(F.percentile("l_extendedprice", q), 4).cast("double") + F.lit(0.0)).alias("p")
    )
    sql = (
        "SELECT l_returnflag, CAST(ROUND(quantile_cont(l_extendedprice, "
        f"{q}), 4) AS DOUBLE) + 0.0 AS p FROM lineitem GROUP BY l_returnflag"
    )
    return df, sql




def _trysafe(rng: random.Random, t: Tables):
    """ANSI-safe try_* arithmetic with randomized live error legs
    (round-13 X185 surface): the NULL-safe tier must compute exactly
    what explicit CASE guards compute, for any divisor modulus."""
    m = rng.randint(2, 9)
    kind = rng.choice(["div", "mod", "tonum"])
    if kind == "div":
        df = t.orders.select(
            F.col("o_orderkey").alias("k"),
            F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % m).alias("v"),
        )
        sql = (
            f"SELECT o_orderkey AS k, CASE WHEN o_custkey % {m} = 0 THEN NULL "
            f"ELSE o_totalprice / (o_custkey % {m}) END AS v FROM orders"
        )
    elif kind == "mod":
        df = t.orders.select(
            F.col("o_orderkey").alias("k"),
            F.try_mod(F.col("o_orderkey"), F.col("o_custkey") % m).alias("v"),
        )
        sql = (
            f"SELECT o_orderkey AS k, CASE WHEN o_custkey % {m} = 0 THEN NULL "
            f"ELSE o_orderkey % (o_custkey % {m}) END AS v FROM orders"
        )
    else:
        n = rng.randint(1, 2)
        df = t.orders.select(
            F.col("o_orderkey").alias("k"),
            F.try_to_number(F.substring("o_orderpriority", 1, n), F.lit("9" * n))
            .cast("long")
            .alias("v"),
        )
        sql = (
            f"SELECT o_orderkey AS k, TRY_CAST(substr(o_orderpriority, 1, {n}) "
            "AS BIGINT) AS v FROM orders"
        )
    return df, sql


def _interval(rng: random.Random, t: Tables):
    """ANSI interval arithmetic (round-13 X189 surface): month-end
    clamping and day offsets must agree across engines for any
    randomized magnitude."""
    months = rng.randint(1, 30)
    days = rng.randint(1, 400)
    kind = rng.choice(["ym", "dt", "diff"])
    if kind == "ym":
        df = t.orders.select(
            F.col("o_orderkey").alias("k"),
            (F.col("o_orderdate") + F.expr(f"INTERVAL '{months}' MONTH")).alias("v"),
        )
        sql = (
            f"SELECT o_orderkey AS k, o_orderdate + INTERVAL {months} MONTH AS v "
            "FROM orders"
        )
    elif kind == "dt":
        df = t.orders.select(
            F.col("o_orderkey").alias("k"),
            (F.col("o_orderdate") - F.make_dt_interval(F.lit(days))).alias("v"),
        )
        sql = (
            f"SELECT o_orderkey AS k, o_orderdate - INTERVAL {days} DAY AS v "
            "FROM orders"
        )
    else:
        df = t.orders.select(
            F.col("o_orderkey").alias("k"),
            F.expr(
                f"timestampdiff(DAY, o_orderdate, o_orderdate + INTERVAL '{months}' MONTH)"
            ).alias("v"),
        )
        sql = (
            f"SELECT o_orderkey AS k, date_diff('day', o_orderdate, "
            f"o_orderdate + INTERVAL {months} MONTH) AS v FROM orders"
        )
    return df, sql


def _regex(rng: random.Random, t: Tables):
    """Regexp family (round-13 X196 surface) over customer names with
    randomized digit-class patterns."""
    d = rng.randint(0, 8)
    kind = rng.choice(["count", "extract", "mask"])
    if kind == "count":
        df = t.customer.select(
            F.col("c_custkey").alias("k"),
            F.regexp_count(F.col("c_name"), F.lit(f"[{d}-9]")).alias("v"),
        )
        sql = (
            f"SELECT c_custkey AS k, CAST(len(regexp_extract_all(c_name, "
            f"'[{d}-9]')) AS INT) AS v FROM customer"
        )
    elif kind == "extract":
        df = t.customer.select(
            F.col("c_custkey").alias("k"),
            F.regexp_extract(F.col("c_name"), f"#(0*[{d}-9][0-9]*)", 1).alias("v"),
        )
        sql = (
            f"SELECT c_custkey AS k, regexp_extract(c_name, '#(0*[{d}-9][0-9]*)', 1) "
            "AS v FROM customer"
        )
    else:
        df = t.customer.select(
            F.col("c_custkey").alias("k"),
            F.regexp_replace(F.col("c_name"), f"[{d}-9]", "#").alias("v"),
        )
        sql = (
            f"SELECT c_custkey AS k, regexp_replace(c_name, '[{d}-9]', '#', 'g') "
            "AS v FROM customer"
        )
    return df, sql


def _one(rng: random.Random, t: Tables):
    shape = rng.random()
    if shape < 0.04:
        return _trysafe(rng, t)
    if shape < 0.08:
        return _interval(rng, t)
    if shape < 0.11:
        return _regex(rng, t)
    if shape < 0.16:
        return _groupingsets(rng, t)
    if shape < 0.21:
        return _percentile(rng, t)
    if shape < 0.28:
        return _outer_join(rng, t)
    if shape < 0.32:
        return _window_frame(rng, t)
    if shape < 0.42:
        return _hof(rng, t)
    if shape < 0.47:
        return _exists(rng, t)
    if shape < 0.51:
        return _setop(rng, t)
    if shape < 0.58:
        return _stringfn(rng, t)
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


@pytest.mark.parametrize("seed", [SEED, SEED + 1, SEED + 2])
def test_random_query_differential(spark, sf_dir, seed):
    rng = random.Random(seed)
    t = Tables(spark, sf_dir)
    con = duckdb_connection(sf_dir)
    failures = []
    for i in range(N_QUERIES):
        sdf, sql = _one(rng, t)
        r = compare(f"fuzz_{i}", sdf, sql, con)
        if not r.match:
            failures.append(f"fuzz_{i}: {r.detail[:200]}\n  SQL: {sql}")
    assert not failures, "\n".join(failures)
