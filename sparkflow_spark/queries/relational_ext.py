"""Extended relational surface: union-all, pivot, rank-family windows,
string/date function families, statistical aggregates, exact
percentiles, string-agg, explode/unnest, array ops, SQL façade with
CTEs, as-of join, offset/fetch, from_json."""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession, Window

from sparkflow_spark import operators
from sparkflow_spark.catalog import Tables, register_views
from sparkflow_spark.functions.text import shingles_from_tokens, tokens, with_tokens
from sparkflow_spark.queries import ordered, register
from sparkflow_spark.queries.relational import dec2


def dec4(col):
    # DOUBLE, not DECIMAL, and `+ 0.0` to normalize IEEE signed zero —
    # see dec2's docstring (driver canonicalization rules).
    return F.round(col, 4).cast("double") + F.lit(0.0)


@register(
    "q41_union_all_agg",
    oracle="""
        SELECT k, COUNT(*) AS c FROM (
            SELECT c_nationkey AS k FROM customer
            UNION ALL
            SELECT s_nationkey FROM supplier) t
        GROUP BY k ORDER BY k
    """,
    tags=("relational", "setop"),
)
def q41(spark: SparkSession, sf: str) -> DataFrame:
    t = Tables(spark, sf)
    return (
        t.customer.select(F.col("c_nationkey").alias("k"))
        .unionAll(t.supplier.select(F.col("s_nationkey").alias("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(ordered, "k")
    )


@register(
    "q42_pivot",
    oracle="""
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("relational", "pivot"),
)
def q42(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot with an EXPLICIT value list (no discovery pass — SCALE.md);
    absent cells normalized to 0 to match conditional-agg semantics."""
    t = Tables(spark, sf)
    out = operators.pivot_agg(
        t.orders, "o_orderpriority", "o_orderstatus", ["F", "O", "P"], F.count(F.lit(1))
    )
    return out.na.fill(0).transform(ordered, "o_orderpriority")


@register(
    "q43_rank_family",
    oracle="""
        SELECT o_orderkey,
               RANK() OVER w AS rnk,
               DENSE_RANK() OVER w AS drnk,
               NTILE(4) OVER w AS tile,
               CAST(ROUND(PERCENT_RANK() OVER w, 4) AS DOUBLE) + 0.0 AS pr,
               CAST(ROUND(CUME_DIST() OVER w, 4) AS DOUBLE) + 0.0 AS cd
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        ORDER BY o_orderkey
    """,
    tags=("relational", "window", "large-output",),
)
def q43(spark: SparkSession, sf: str) -> DataFrame:
    t = Tables(spark, sf)
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        t.orders.select(
            "o_orderkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("tile"),
            dec4(F.percent_rank().over(w)).alias("pr"),
            dec4(F.cume_dist().over(w)).alias("cd"),
        )
    )


@register(
    "q44_string_functions2",
    oracle="""
        SELECT p_partkey,
               lpad(p_brand, 12, '*') AS lp,
               rpad(p_brand, 12, '.') AS rp,
               CAST(strpos(p_type, 'a') AS INT) AS pos,
               translate(p_name, 'aeiou', 'AEIOU') AS tr,
               reverse(p_brand) AS rev,
               substring(p_name, 1, 3) AS l3
        FROM part ORDER BY p_partkey
    """,
    tags=("relational", "functions"),
)
def q44(spark: SparkSession, sf: str) -> DataFrame:
    t = Tables(spark, sf)
    return (
        t.part.select(
            "p_partkey",
            F.lpad("p_brand", 12, "*").alias("lp"),
            F.rpad("p_brand", 12, ".").alias("rp"),
            F.instr(F.col("p_type"), "a").alias("pos"),
            F.translate("p_name", "aeiou", "AEIOU").alias("tr"),
            F.reverse("p_brand").alias("rev"),
            F.substring("p_name", 1, 3).alias("l3"),
        )
    )


@register(
    "q45_date_functions2",
    oracle="""
        SELECT o_orderkey,
               CAST(quarter(o_orderdate) AS INT) AS q,
               CAST(isodow(o_orderdate) AS INT) AS dow,
               CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
               CAST(last_day(o_orderdate) AS DATE) AS eom,
               CAST(datediff('day', DATE '1995-06-15', o_orderdate) AS INT) AS dd
        FROM orders ORDER BY o_orderkey
    """,
    tags=("relational", "functions", "large-output",),
)
def q45(spark: SparkSession, sf: str) -> DataFrame:
    """ISO day-of-week bridges the dialect split (Spark weekday()=0 for
    Monday; DuckDB isodow=1 for Monday)."""
    t = Tables(spark, sf)
    return (
        t.orders.select(
            "o_orderkey",
            F.quarter("o_orderdate").alias("q"),
            (F.weekday("o_orderdate") + 1).alias("dow"),
            F.date_add(F.col("o_orderdate").cast("date"), 30).alias("plus30"),
            F.last_day("o_orderdate").alias("eom"),
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-06-15").cast("date")).alias("dd"),
        )
    )


@register(
    "q46_stats_agg",
    oracle="""
        SELECT l_returnflag,
               CAST(ROUND(stddev_samp(l_quantity), 2) AS DOUBLE) + 0.0 AS sd,
               CAST(ROUND(var_samp(l_quantity), 2) AS DOUBLE) + 0.0 AS vr,
               CAST(ROUND(corr(l_quantity, l_extendedprice), 4) AS DOUBLE) + 0.0 AS cr,
               CAST(ROUND(covar_samp(l_quantity, l_discount), 4) AS DOUBLE) + 0.0 AS cv
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("relational", "agg", "stats"),
)
def q46(spark: SparkSession, sf: str) -> DataFrame:
    """Statistical aggregates — bounded-magnitude combos only (corr is
    normalized; covar over small-scale columns) so cross-engine float
    accumulation differences stay below the rounding grain."""
    t = Tables(spark, sf)
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            dec2(F.stddev_samp("l_quantity")).alias("sd"),
            dec2(F.var_samp("l_quantity")).alias("vr"),
            dec4(F.corr("l_quantity", "l_extendedprice")).alias("cr"),
            dec4(F.covar_samp("l_quantity", "l_discount")).alias("cv"),
        )
        .transform(ordered, "l_returnflag")
    )


@register(
    "q47_median_percentile",
    oracle="""
        SELECT l_returnflag,
               CAST(ROUND(median(l_quantity), 2) AS DOUBLE) + 0.0 AS med,
               CAST(ROUND(quantile_cont(l_quantity, 0.75), 2) AS DOUBLE) + 0.0 AS p75
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("relational", "agg", "stats"),
)
def q47(spark: SparkSession, sf: str) -> DataFrame:
    """Exact median / continuous percentile (both engines interpolate)."""
    t = Tables(spark, sf)
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            dec2(F.median("l_quantity")).alias("med"),
            dec2(F.percentile("l_quantity", 0.75)).alias("p75"),
        )
        .transform(ordered, "l_returnflag")
    )


@register(
    "q48_string_agg",
    oracle="""
        SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
    tags=("relational", "agg"),
)
def q48(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered string aggregation: collect_list is unordered in a
    distributed engine, so determinism comes from array_sort before the
    join — the portable form of ORDER BY inside an aggregate."""
    t = Tables(spark, sf)
    return (
        t.nation.groupBy("n_regionkey")
        .agg(F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("names"))
        .transform(ordered, "n_regionkey")
    )


@register(
    "q49_explode_top_shingles",
    oracle="""
        WITH sh AS (
            SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                       unnest(CASE WHEN len(toks) >= 3 THEN
                            list_transform(range(1, len(toks) - 1),
                                i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
                       ELSE [array_to_string(toks, ' ')] END) AS shingle
                FROM (SELECT doc_id,
                             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                         x -> x != '') AS toks
                      FROM documents))
        )
        SELECT shingle, COUNT(*) AS df FROM sh
        GROUP BY shingle ORDER BY df DESC, shingle LIMIT 20
    """,
    tags=("relational", "explode", "text"),
)
def q49(spark: SparkSession, sf: str) -> DataFrame:
    """explode/unnest + document-frequency top-k (the skew-diagnosis
    query you run before capping shingles in dedup)."""
    t = Tables(spark, sf)
    return (
        with_tokens(t.documents.select("doc_id", "text"))
        .select("doc_id", F.explode(shingles_from_tokens("_toks", 3)).alias("shingle"))
        # r13: no .distinct() — shingles_from_tokens is array_distinct
        # per doc, so (doc_id, shingle) is already unique and the
        # dedup was a redundant full exchange (guide §2.4)
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), "shingle")
        .limit(20)
    )


@register(
    "q50_array_ops",
    oracle="""
        SELECT doc_id,
               list_sort(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                     x -> x != ''))[1] AS first_sorted,
               CAST(len(list_distinct(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                                  x -> x != ''))) AS INT) AS n_distinct,
               list_max(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                    x -> x != '')) AS max_tok
        FROM documents ORDER BY doc_id
    """,
    tags=("relational", "array"),
)
def q50(spark: SparkSession, sf: str) -> DataFrame:
    t = Tables(spark, sf)
    toks = F.transform(tokens(F.col("text")), lambda x: F.lower(x))
    return (
        t.documents.select(
            "doc_id",
            F.element_at(F.array_sort(toks), 1).alias("first_sorted"),
            F.size(F.array_distinct(toks)).alias("n_distinct"),
            F.array_max(toks).alias("max_tok"),
        )
        .transform(ordered, "doc_id")
    )


_CTE_SQL = """
    WITH rev AS (
        SELECT c_nationkey AS nk, SUM(o_totalprice) AS total
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_nationkey
    )
    SELECT n_name, CAST(ROUND(total, 2) AS DOUBLE) + 0.0 AS rev
    FROM rev JOIN nation ON nk = n_nationkey
    ORDER BY n_name
"""


@register("q51_sql_facade_cte", oracle=_CTE_SQL, tags=("relational", "sql"))
def q51(spark: SparkSession, sf: str) -> DataFrame:
    """The SQL façade: the IDENTICAL SQL text runs through spark.sql on
    registered views and through DuckDB — dialect-portable by
    construction (SURVEY.md §7 design stance)."""
    register_views(spark, sf)
    return spark.sql(_CTE_SQL)


@register(
    "q52_asof_join",
    oracle="""
        SELECT e.event_id,
               CAST(date_trunc('second',
                    (SELECT MAX(s.ts) FROM events s
                     WHERE s.user_id = e.user_id AND s.event_type = 'signup'
                       AND s.ts <= e.ts)) AS TIMESTAMP) AS signup_ts
        FROM events e WHERE e.event_type = 'purchase'
        ORDER BY e.event_id
    """,
    tags=("relational", "asof"),
)
def q52(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: each purchase gets the user's most recent prior
    signup timestamp (truncated to seconds — the fixtures' ns precision
    exceeds Spark's µs). Single shuffle on user_id; see operators.asof_join."""
    t = Tables(spark, sf)
    purchases = t.events.filter(F.col("event_type") == "purchase")
    signups = t.events.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("ts").alias("signup_ts")
    )
    joined = operators.asof_join(
        purchases, signups, on="ts", by=["user_id"], value_cols=["signup_ts"], suffix=""
    )
    return joined.select(
        "event_id", F.date_trunc("second", "signup_ts").alias("signup_ts")
    )


@register(
    "q114_asof_forward",
    oracle="""
        SELECT e.event_id,
               CAST(date_trunc('second',
                    (SELECT MIN(p.ts) FROM events p
                     WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
                       AND p.ts >= e.ts)) AS TIMESTAMP) AS next_purchase_ts
        FROM events e WHERE e.event_type = 'signup'
        ORDER BY e.event_id
    """,
    tags=("relational", "asof"),
)
def q114(spark: SparkSession, sf: str) -> DataFrame:
    """FORWARD as-of join (r9 operator extension — time-to-next-event
    analytics: each signup gets the user's NEXT purchase timestamp, or
    NULL if none follows). Same single-shuffle union-window kernel as
    q52, traversed in descending time."""
    t = Tables(spark, sf)
    signups = t.events.filter(F.col("event_type") == "signup")
    purchases = t.events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("ts").alias("next_purchase_ts")
    )
    joined = operators.asof_join(
        signups,
        purchases,
        on="ts",
        by=["user_id"],
        value_cols=["next_purchase_ts"],
        suffix="",
        direction="forward",
    )
    return joined.select(
        "event_id", F.date_trunc("second", "next_purchase_ts").alias("next_purchase_ts")
    ).transform(ordered, "event_id")


@register(
    "q115_asof_nearest",
    oracle="""
        WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        m AS (
            SELECT e.event_id, e.ts,
                   (SELECT MAX(s.ts) FROM events s
                    WHERE s.user_id = e.user_id AND s.event_type = 'signup'
                      AND s.ts <= e.ts) AS back_ts,
                   (SELECT MIN(s.ts) FROM events s
                    WHERE s.user_id = e.user_id AND s.event_type = 'signup'
                      AND s.ts >= e.ts) AS fwd_ts
            FROM p e)
        SELECT event_id,
               CAST(date_trunc('second',
                 CASE WHEN fwd_ts IS NULL THEN back_ts
                      WHEN back_ts IS NULL THEN fwd_ts
                      WHEN epoch_us(ts) - epoch_us(back_ts)
                           <= epoch_us(fwd_ts) - epoch_us(ts) THEN back_ts
                      ELSE fwd_ts END) AS TIMESTAMP) AS nearest_signup_ts
        FROM m ORDER BY event_id
    """,
    tags=("relational", "asof"),
)
def q115(spark: SparkSession, sf: str) -> DataFrame:
    """NEAREST as-of join (each purchase gets the closest signup in
    time, either direction, ties to the earlier/backward match — the
    pandas merge_asof tie rule). Two sorted passes over ONE user_id
    exchange; |Δt| compared at exact µs precision on both engines."""
    t = Tables(spark, sf)
    purchases = t.events.filter(F.col("event_type") == "purchase")
    signups = t.events.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("ts").alias("nearest_signup_ts")
    )
    joined = operators.asof_join(
        purchases,
        signups,
        on="ts",
        by=["user_id"],
        value_cols=["nearest_signup_ts"],
        suffix="",
        direction="nearest",
    )
    return joined.select(
        "event_id",
        F.date_trunc("second", "nearest_signup_ts").alias("nearest_signup_ts"),
    ).transform(ordered, "event_id")


@register(
    "q53_offset_fetch",
    oracle="""
        SELECT o_orderkey, CAST(ROUND(o_totalprice, 2) AS DOUBLE) + 0.0 AS tp
        FROM orders ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10 OFFSET 10
    """,
    tags=("relational", "sort"),
)
def q53(spark: SparkSession, sf: str) -> DataFrame:
    t = Tables(spark, sf)
    return (
        t.orders.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(10)
        .limit(10)
        .select("o_orderkey", dec2(F.col("o_totalprice")).alias("tp"))
    )


@register(
    "q54_from_json",
    oracle="""
        SELECT event_id, CAST(props->>'$.k' AS INT) AS k2
        FROM events ORDER BY event_id
    """,
    tags=("relational", "json", "large-output",),
)
def q54(spark: SparkSession, sf: str) -> DataFrame:
    """Schema-full JSON parse (from_json → typed struct), vs q30's
    path-extraction — both must agree with the oracle."""
    t = Tables(spark, sf)
    parsed = F.from_json("props", T.StructType([T.StructField("k", T.IntegerType())]))
    return t.events.select("event_id", parsed.getField("k").alias("k2"))


@register(
    "q55_cube_grouping",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
               CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
               COUNT(*) AS c,
               CAST(ROUND(SUM(l_quantity), 2) AS DOUBLE) + 0.0 AS sum_qty
        FROM lineitem
        GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("relational", "agg"),
)
def q55(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE with GROUPING() markers — all 2^k grouping sets in one
    partial+final aggregate pass (each input row expands to its 4
    grouping-set rows map-side; no per-set rescan). GROUPING()
    disambiguates "NULL because subtotal" from "NULL in the data",
    which ROLLUP/q16 alone can't."""
    t = Tables(spark, sf)
    return (
        t.lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
            F.count(F.lit(1)).alias("c"),
            dec2(F.sum("l_quantity")).alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "g_rf", "g_ls", "c", "sum_qty")
        .transform(
            ordered,
            "g_rf",
            "g_ls",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "q56_time_range_window",
    oracle="""
        SELECT event_id, user_id, epoch_s,
               CAST(ROUND(SUM(value) OVER (
                   PARTITION BY user_id ORDER BY epoch_s
                   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2)
                 AS DOUBLE) + 0.0 AS rolling_1h
        FROM (
            SELECT event_id, user_id, value,
                   -- FLOOR before CAST: duckdb's double->int CAST rounds
                   -- half-up, Spark's unix_timestamp truncates sub-seconds
                   CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch_s
            FROM events
        )
    """,
    tags=("relational", "window", "large-output",),
)
def q56(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding TIME-RANGE window in batch: per user, the 1-hour
    trailing sum of `value` — a RANGE frame over epoch seconds, the
    batch twin of the streaming sliding window (st_sliding_counts).
    Unlike a ROWS frame, the frame edge is a value predicate, so ties
    and gaps in event time are handled identically on any engine.

    Scale: one shuffle on user_id, then a single sort per partition;
    the frame is evaluated with two moving pointers over the sorted
    run — O(n) per partition, no per-row rescan.
    """
    t = Tables(spark, sf)
    e = t.events.select(
        "event_id",
        "user_id",
        "value",
        F.unix_timestamp("ts").cast("bigint").alias("epoch_s"),
    )
    # RANGE frames allow exactly one numeric ORDER BY expression (both
    # engines enforce this) and need no tiebreak: the frame edge is a
    # VALUE predicate, so rows tied on epoch_s always fall in each
    # other's frames — per-row sums are well-defined under duplicates.
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "epoch_s",
        dec2(F.sum("value").over(w)).alias("rolling_1h"),
    )


@register(
    "q57_string_distance",
    oracle="""
        SELECT c_custkey,
               CAST(levenshtein(c_name, 'Customer#000000001') AS INT) AS d_anchor,
               CAST(levenshtein(c_name, reverse(c_name)) AS INT) AS d_palin
        FROM customer
    """,
    tags=("relational", "string"),
)
def q57(spark: SparkSession, sf: str) -> DataFrame:
    """Edit-distance scalar functions (fuzzy-matching building block —
    candidate verification for record linkage after a blocking join).
    Both engines implement the same Wagner-Fischer levenshtein, checked
    here against an anchor and a per-row derived string. Per-row scalar
    → scan-bound at any scale."""
    t = Tables(spark, sf)
    return t.customer.select(
        "c_custkey",
        F.levenshtein(F.col("c_name"), F.lit("Customer#000000001"))
        .cast("int")
        .alias("d_anchor"),
        F.levenshtein(F.col("c_name"), F.reverse(F.col("c_name")))
        .cast("int")
        .alias("d_palin"),
    )


@register(
    "q58_unpivot",
    oracle="""
        SELECT measure,
               CAST(ROUND(SUM(val), 2) AS DECIMAL(18,2)) AS total
        FROM (
            UNPIVOT (SELECT l_quantity, l_extendedprice, l_discount FROM lineitem)
            ON l_quantity, l_extendedprice, l_discount
            INTO NAME measure VALUE val
        )
        GROUP BY measure ORDER BY measure
    """,
    tags=("relational", "reshape"),
)
def q58(spark: SparkSession, sf: str) -> DataFrame:
    """UNPIVOT / melt (the inverse of q42's pivot): wide measure columns
    → (measure, value) rows, then aggregate per measure. Spark's
    ``unpivot`` expands each row to n_measures rows map-side — no
    shuffle until the aggregation, which is partial-then-final."""
    t = Tables(spark, sf)
    return (
        t.lineitem.select("l_quantity", "l_extendedprice", "l_discount")
        .unpivot([], ["l_quantity", "l_extendedprice", "l_discount"], "measure", "val")
        .groupBy("measure")
        .agg(dec2(F.sum("val")).alias("total"))
        .transform(ordered, "measure")
    )


@register(
    "q59_array_exists_forall",
    oracle="""
        SELECT vec_id,
               len(list_filter(embedding, x -> x > 0.5)) > 0 AS has_hi,
               len(list_filter(embedding, x -> NOT (abs(x) <= 0.99))) = 0 AS bounded
        FROM embeddings ORDER BY vec_id
    """,
    tags=("relational", "array"),
)
def q59(spark: SparkSession, sf: str) -> DataFrame:
    """Array predicate quantifiers: EXISTS (any element matches) and
    FORALL (every element matches) over the embedding column — per-row
    expressions, scan-bound at any scale. Cross-engine parity: both
    engines parse the literals to the same IEEE double and float→double
    promotion is exact, so every comparison resolves identically."""
    t = Tables(spark, sf)
    return t.embeddings.select(
        "vec_id",
        F.exists("embedding", lambda x: x > 0.5).alias("has_hi"),
        F.forall("embedding", lambda x: F.abs(x) <= 0.99).alias("bounded"),
    ).transform(ordered, "vec_id")


@register(
    "q60_exact_percentiles",
    oracle="""
        SELECT l_returnflag,
               CAST(ROUND(quantile_cont(l_quantity, 0.5), 2) AS DOUBLE) + 0.0 AS med_qty,
               CAST(ROUND(quantile_cont(l_extendedprice, 0.25), 2) AS DOUBLE) + 0.0 AS p25_price,
               CAST(ROUND(quantile_cont(l_extendedprice, 0.75), 2) AS DOUBLE) + 0.0 AS p75_price
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("relational", "agg", "percentile"),
)
def q60(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT percentiles (ordered-set aggregate family): Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` both implement the
    continuous (linearly interpolated) quantile over the sorted group,
    so the results are comparable to rounding — unlike approx sketches
    (q15's lesson). Exact percentiles sort each group's values: fine for
    bounded group counts; at 100 TB switch to percentile_approx and a
    thresholded check (the q15 pattern) instead."""
    t = Tables(spark, sf)
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            dec2(F.expr("percentile(l_quantity, 0.5)")).alias("med_qty"),
            dec2(F.expr("percentile(l_extendedprice, 0.25)")).alias("p25_price"),
            dec2(F.expr("percentile(l_extendedprice, 0.75)")).alias("p75_price"),
        )
        .transform(ordered, "l_returnflag")
    )


@register(
    "q61_approx_percentile_within_5pct",
    oracle="""
        SELECT CAST(ABS(approx_quantile(l_extendedprice, 0.5)
                        - quantile_cont(l_extendedprice, 0.5))
                    <= 0.05 * quantile_cont(l_extendedprice, 0.5) AS INT) AS ok
        FROM lineitem
    """,
    tags=("relational", "agg", "approx", "percentile"),
)
def q61(spark: SparkSession, sf: str) -> DataFrame:
    """Approx-percentile sketch judged against the exact percentile —
    the q15 pattern: sketch VALUES are engine-specific (Spark's
    percentile_approx vs DuckDB's t-digest) and can never hash-match,
    but "within 5% of exact" is expressible on both engines, each
    judging its own sketch. At 100 TB the approx form is the real
    operator (exact percentiles sort every group); this row keeps it
    driver-checkable."""
    t = Tables(spark, sf)
    exact = F.expr("percentile(l_extendedprice, 0.5)")
    approx = F.expr("percentile_approx(l_extendedprice, 0.5, 10000)")
    return t.lineitem.agg(
        (F.abs(approx - exact) <= 0.05 * exact).cast("int").alias("ok")
    )


@register(
    "q72_running_median",
    oracle="""
        SELECT user_id, event_id,
               CAST(ROUND(quantile_cont(value, 0.5) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 5 PRECEDING AND CURRENT ROW), 4) AS DOUBLE) + 0.0
                 AS med
        FROM events
        ORDER BY user_id, event_id
    """,
    tags=("relational", "window", "percentile"),
)
def q72_runmed(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling 6-row median per user (time-series denoising): the exact
    ordered-set aggregate as a WINDOW function over a rows frame —
    continuous-interpolated on both engines (the X12 rule), event_id
    tiebreak for a total order. One key exchange like any window; the
    frame is rows-bounded so state per partition is O(frame)."""
    from sparkflow_spark.queries.relational import dec2  # noqa: F401

    t = Tables(spark, sf)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-5, Window.currentRow)
    )
    return (
        t.events.select(
            "user_id",
            "event_id",
            (F.round(F.percentile("value", 0.5).over(w), 4).cast("double") + F.lit(0.0)).alias("med"),
        )
        .transform(ordered, "user_id", "event_id")
    )


@register(
    "q74_quantile_normalize",
    oracle="""
        SELECT event_id,
               CAST(ROUND(percent_rank() OVER (
                   PARTITION BY event_type ORDER BY value, event_id), 4) AS DOUBLE)
                 + 0.0 AS qnorm
        FROM events
        ORDER BY event_id
    """,
    tags=("relational", "window", "ml-prep"),
)
def q74_qnorm(spark: SparkSession, sf: str) -> DataFrame:
    """Quantile normalization (rank-to-[0,1] feature scaling) of the
    value column within each event type — the distribution-free scaler
    ML pipelines apply before training. The event_id tiebreak makes the
    order total, so the mapping is bit-stable cross-engine.

    ``percent_rank() OVER (PARTITION BY event_type ...)`` would put
    each event type in ONE task — with a handful of types that is a
    handful of tasks regardless of data size — so this computes the
    identical value as (rank-1)/(n_group-1) over the grouped two-phase
    global_rank (range exchange spreads each type across many
    partitions; see SCALE.md round-6f) with a broadcast per-type count."""
    from sparkflow_spark.operators import global_rank

    t = Tables(spark, sf)
    ranked = global_rank(
        t.events.select("event_id", "event_type", "value"),
        ["value", "event_id"],
        rank_col="_rk",
        group_cols=["event_type"],
    )
    ng = t.events.groupBy("event_type").agg(F.count(F.lit(1)).alias("_ng"))
    pr = F.when(
        F.col("_ng") > 1, (F.col("_rk") - 1) / (F.col("_ng") - 1)
    ).otherwise(F.lit(0.0))
    return (
        ranked.join(F.broadcast(ng), "event_type")
        .select(
            "event_id",
            (F.round(pr, 4).cast("double") + F.lit(0.0)).alias("qnorm"),
        )
        .transform(ordered, "event_id")
    )


@register(
    "q76_winsorize",
    oracle="""
        WITH b AS (
            SELECT event_type,
                   quantile_cont(value, 0.05) AS lo,
                   quantile_cont(value, 0.95) AS hi
            FROM events GROUP BY event_type)
        SELECT e.event_id,
               CAST(ROUND(LEAST(GREATEST(e.value, b.lo), b.hi), 4) AS DOUBLE) + 0.0
                 AS winsorized
        FROM events e JOIN b USING (event_type)
        ORDER BY e.event_id
    """,
    tags=("relational", "percentile", "ml-prep"),
)
def q76_winsor(spark: SparkSession, sf: str) -> DataFrame:
    """Winsorization: clip values to the per-group [p05, p95] band —
    the standard outlier-robust feature clamp. Per-group exact
    percentiles (X12 continuous interpolation) ride a broadcast join
    back onto the fact; the clip is a scalar LEAST/GREATEST."""
    t = Tables(spark, sf)
    ev = t.events.select("event_id", "event_type", "value")
    b = ev.groupBy("event_type").agg(
        F.percentile("value", 0.05).alias("lo"),
        F.percentile("value", 0.95).alias("hi"),
    )
    return (
        ev.join(F.broadcast(b), "event_type")
        .select(
            "event_id",
            (
                F.round(F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")), 4)
                .cast("double") + F.lit(0.0)
            ).alias("winsorized"),
        )
        .transform(ordered, "event_id")
    )


@register(
    "q81_customer_deciles",
    oracle="""
        WITH spend AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                     AS cents
            FROM orders GROUP BY o_custkey),
        ranked AS (
            SELECT o_custkey, cents,
                   CAST(((ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey) - 1) * 10)
                        // (COUNT(*) OVER ()) AS INT) + 1 AS decile
            FROM spend)
        SELECT decile,
               COUNT(*) AS n_customers,
               CAST(SUM(cents) AS BIGINT) AS decile_cents,
               CAST(MIN(cents) AS BIGINT) AS min_cents,
               CAST(MAX(cents) AS BIGINT) AS max_cents
        FROM ranked GROUP BY decile ORDER BY decile
    """,
    tags=("relational", "window", "agg"),
)
def q81_deciles(spark: SparkSession, sf: str) -> DataFrame:
    """Customer revenue deciles: per-customer spend in EXACT integer
    cents (two-decimal prices → round(x*100) is lossless, and the
    BIGINT sums are order-independent — no float aggregation anywhere),
    equal-count deciles with a custkey tiebreak, then per-decile
    totals. The decile split needs a global rank; instead of NTILE's
    single-partition window this uses operators.global_rank (range
    exchange + per-partition row_number + broadcast offsets — see
    q102/SCALE.md round-6f) and derives decile = (rank-1)·10 DIV n,
    integer-exact in both engines and scale-safe at billion-customer
    cardinality."""
    from sparkflow_spark.operators import global_rank

    t = Tables(spark, sf)
    spend = t.orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint").alias("cents")
    )
    spend = spend.withColumn("_negc", -F.col("cents"))
    ranked_r = global_rank(spend, ["_negc", "o_custkey"], rank_col="_rk")
    n_total = spend.select(F.count(F.lit(1)).alias("_n"))
    ranked = (
        ranked_r.crossJoin(F.broadcast(n_total))
        .withColumn("decile", F.expr("CAST(((_rk - 1) * 10) DIV _n AS INT)") + F.lit(1))
        .drop("_negc", "_rk", "_n")
    )
    return (
        ranked.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("cents").cast("bigint").alias("decile_cents"),
            F.min("cents").cast("bigint").alias("min_cents"),
            F.max("cents").cast("bigint").alias("max_cents"),
        )
        .transform(ordered, "decile")
    )


@register(
    "q82_approx_distinct_hourly",
    oracle="""
        SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS w,
               COUNT(DISTINCT user_id) AS exact_users,
               ABS(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
                 <= GREATEST(0.15 * COUNT(DISTINCT user_id), 20) AS sketch_ok
        FROM events GROUP BY 1 ORDER BY 1
    """,
    tags=("relational", "approx", "window"),
)
def q82_approx_hourly(spark: SparkSession, sf: str) -> DataFrame:
    """Per-hour distinct users: exact count plus a thresholded check
    that EACH ENGINE'S own HLL sketch lands inside max(15%, 20) of its
    exact value (the q15 pattern, here per group — sketches aren't
    cross-engine comparable, booleans are). The bound is sized to
    HLL++ rsd=5% small-cardinality behavior (measured worst case:
    Spark 10.8% rel / 15 abs on ~100-user hours; DuckDB 4% / 5) —
    tight enough that a broken sketch fails, loose enough that healthy
    engine variance passes. The shape that replaces exact distinct at
    100 TB: the sketch is mergeable map-side, the exact leg exists only
    to judge it."""
    t = Tables(spark, sf)
    g = t.events.groupBy(F.date_trunc("hour", "ts").alias("w"))
    return (
        g.agg(
            F.count_distinct("user_id").alias("exact_users"),
            (
                F.abs(
                    F.approx_count_distinct("user_id") - F.count_distinct("user_id")
                )
                <= F.greatest(0.15 * F.count_distinct("user_id"), F.lit(20.0))
            ).alias("sketch_ok"),
        )
        .transform(ordered, "w")
    )


@register(
    "q83_not_in_null_semantics",
    oracle="""
        SELECT
            (SELECT COUNT(*) FROM orders
             WHERE o_custkey NOT IN
                   (SELECT CASE WHEN c_custkey % 100 = 0 THEN NULL
                                ELSE c_custkey END
                    FROM customer)) AS with_null_list,
            (SELECT COUNT(*) FROM orders
             WHERE o_custkey NOT IN
                   (SELECT c_custkey FROM customer WHERE c_custkey % 100 <> 0))
              AS without_nulls
    """,
    tags=("relational", "join", "semantics"),
)
def q83_not_in(spark: SparkSession, sf: str) -> DataFrame:
    """NOT IN three-valued-logic corner: one NULL in the subquery makes
    NOT IN unsatisfiable for every probe (x <> NULL is UNKNOWN), so
    with_null_list must be 0 while the NULL-free twin counts normally.
    Spark plans the null-aware anti join; naive LEFT ANTI (which treats
    NULL as non-matching) silently gets this wrong — the single worst
    porting trap in the anti-join family, pinned cross-engine here."""
    import uuid

    t = Tables(spark, sf)
    with_nulls = t.customer.select(
        F.when(F.col("c_custkey") % 100 == 0, F.lit(None))
        .otherwise(F.col("c_custkey"))
        .alias("k")
    )
    no_nulls = t.customer.where(F.col("c_custkey") % 100 != 0).select(
        F.col("c_custkey").alias("k")
    )
    o = t.orders.select("o_custkey")
    # unique view names per invocation (concurrent runs on one session
    # must not clobber each other), dropped right after spark.sql() —
    # safe because analysis resolves views eagerly at construction, so
    # the returned plan no longer references them
    tag = uuid.uuid4().hex[:12]
    names = {
        "o": f"_q83_orders_{tag}",
        "wn": f"_q83_with_nulls_{tag}",
        "nn": f"_q83_no_nulls_{tag}",
    }
    o.createOrReplaceTempView(names["o"])
    with_nulls.createOrReplaceTempView(names["wn"])
    no_nulls.createOrReplaceTempView(names["nn"])
    try:
        return spark.sql(
            f"""
            SELECT
                (SELECT COUNT(*) FROM {names["o"]}
                 WHERE o_custkey NOT IN (SELECT k FROM {names["wn"]}))
                  AS with_null_list,
                (SELECT COUNT(*) FROM {names["o"]}
                 WHERE o_custkey NOT IN (SELECT k FROM {names["nn"]}))
                  AS without_nulls
            """
        )
    finally:
        for v in names.values():
            spark.catalog.dropTempView(v)


@register(
    "q84_dwell_time_stats",
    oracle="""
        WITH d AS (
            SELECT event_type,
                   epoch_us(ts) - epoch_us(lag(ts) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
            FROM events)
        SELECT event_type,
               COUNT(gap_us) AS n_gaps,
               CAST(ROUND(quantile_cont(gap_us, 0.5), 1) AS DOUBLE) + 0.0
                 AS median_gap_us,
               CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
        FROM d WHERE gap_us IS NOT NULL
        GROUP BY event_type ORDER BY event_type
    """,
    tags=("relational", "window", "percentile"),
)
def q84_dwell(spark: SparkSession, sf: str) -> DataFrame:
    """Dwell-time distribution: exact integer-µs gaps between each
    user's consecutive events (lag on one user_id exchange), summarized
    per arriving event type with an exact median. Integer gaps make the
    percentile's interpolation the only float op — deterministic
    cross-engine."""
    t = Tables(spark, sf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = t.events.select(
        "event_type",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    return (
        d.groupBy("event_type")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            (F.round(F.percentile("gap_us", 0.5), 1).cast("double") + F.lit(0.0)).alias("median_gap_us"),
            F.max("gap_us").cast("bigint").alias("max_gap_us"),
        )
        .transform(ordered, "event_type")
    )


@register(
    "q90_referential_integrity",
    oracle="""
        SELECT
            (SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey))
              AS orphan_lineitems,
            (SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                               WHERE l.l_orderkey = o.o_orderkey))
              AS childless_orders,
            (SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey))
              AS orphan_orders
        """,
    tags=("relational", "integrity", "join"),
)
def q90_ri(spark: SparkSession, sf: str) -> DataFrame:
    """Referential-integrity audit: FK orphans in both directions
    across the order graph, as three LEFT ANTI joins (each a plain
    keyed join — NOT the NOT-IN trap q83 pins, since NOT EXISTS is
    NULL-safe by construction). The post-load data-quality gate: three
    counts, each shuffle-keyed, output O(1).

    r13: the three audits were separate eager .count() driver actions —
    three SEQUENTIAL jobs with driver round trips between them (guide
    §5.4). Now one lazy plan: each audit is a 1-row aggregate and the
    cross-joins of 1-row frames fuse them into a single job whose legs
    run concurrently. Same three exact counts."""
    t = Tables(spark, sf)
    orphan_li = (
        t.lineitem.join(
            t.orders.select("o_orderkey"),
            t.lineitem["l_orderkey"] == F.col("o_orderkey"),
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("orphan_lineitems"))
    )
    childless_o = (
        t.orders.join(
            t.lineitem.select("l_orderkey"),
            t.orders["o_orderkey"] == F.col("l_orderkey"),
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("childless_orders"))
    )
    orphan_o = (
        t.orders.join(
            t.customer.select("c_custkey"),
            t.orders["o_custkey"] == F.col("c_custkey"),
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("orphan_orders"))
    )
    return orphan_li.crossJoin(childless_o).crossJoin(orphan_o)


@register(
    "q96_grouping_sets",
    oracle="""
        SELECT o_orderpriority, o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(ROUND(SUM(o_totalprice), 2) AS DOUBLE) + 0.0 AS rev
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """,
    tags=("relational", "agg"),
)
def q96_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form ROLLUP (q16) and CUBE
    (q55) are sugar for: two one-dimension marginals plus the grand
    total in ONE pass (Catalyst plans an Expand, so the fact scan runs
    once, not per set). Same partial-agg scale story as any groupBy."""
    t = Tables(spark, sf)
    return (
        t.orders.groupingSets(
            [["o_orderpriority"], ["o_orderstatus"], []],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (F.round(F.sum("o_totalprice"), 2).cast("double") + F.lit(0.0)).alias(
                "rev"
            ),
        )
        .transform(ordered, "o_orderpriority", "o_orderstatus")
    )


@register(
    "q97_except_all",
    oracle="""
        SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
        EXCEPT ALL
        SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("relational", "setop", "large-output"),
)
def q97_except_all(spark: SparkSession, sf: str) -> DataFrame:
    """EXCEPT ALL — BAG-semantics difference (q24 covers the DISTINCT
    forms): each row survives max(count_left - count_right, 0) times.
    Spark plans a count-aggregated generate, one shuffle per side."""
    t = Tables(spark, sf)
    left = t.orders.where(F.col("o_orderstatus") == "O").select("o_orderpriority")
    right = t.orders.where(F.col("o_orderstatus") == "F").select("o_orderpriority")
    # output multiplicity scales with the input -> large-output tag, no
    # single-partition final sort (the driver compare is order-blind)
    return left.exceptAll(right)


@register(
    "q98_intersect_all",
    oracle="""
        SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
        INTERSECT ALL
        SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("relational", "setop", "large-output"),
)
def q98_intersect_all(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT ALL — bag-semantics intersection: each row survives
    min(count_left, count_right) times."""
    t = Tables(spark, sf)
    left = t.orders.where(F.col("o_orderstatus") == "O").select("o_orderpriority")
    right = t.orders.where(F.col("o_orderstatus") == "F").select("o_orderpriority")
    return left.intersectAll(right)


@register(
    "q99_regression_per_group",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS DOUBLE)
                 + 0.0 AS slope,
               CAST(ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS DOUBLE)
                 + 0.0 AS intercept,
               CAST(ROUND(corr(l_extendedprice, l_quantity), 6) AS DOUBLE)
                 + 0.0 AS r
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    tags=("relational", "stats"),
)
def q99_regression(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group ordinary-least-squares fit with the SQL-standard
    REGR_* aggregates (price explained by quantity per returnflag/
    linestatus): slope, intercept, Pearson r. One partial-aggregable
    pass — Catalyst computes the five running moments map-side, so the
    shuffle carries one row per (flag, status), never the data. The
    bread-and-butter "fit a trend per segment" analytics shape that
    otherwise gets hand-rolled from sums of squares."""
    t = Tables(spark, sf)
    price = F.col("l_extendedprice").cast("double")
    qty = F.col("l_quantity").cast("double")
    return (
        t.lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (F.round(F.regr_slope(price, qty), 4).cast("double") + F.lit(0.0)).alias("slope"),
            (F.round(F.regr_intercept(price, qty), 4).cast("double") + F.lit(0.0)).alias("intercept"),
            (F.round(F.corr(price, qty), 6).cast("double") + F.lit(0.0)).alias("r"),
        )
        .transform(ordered, "l_returnflag", "l_linestatus")
    )


@register(
    "q100_heavy_hitters",
    oracle="""
        WITH c AS (
            SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type
        ),
        ranked AS (
            SELECT event_type, cnt,
                   cnt * 1.0 / SUM(cnt) OVER () AS share,
                   SUM(cnt) OVER (ORDER BY cnt DESC, event_type
                                  ROWS UNBOUNDED PRECEDING) * 1.0
                     / SUM(cnt) OVER () AS cum_share,
                   ROW_NUMBER() OVER (ORDER BY cnt DESC, event_type) AS rk
            FROM c
        )
        SELECT event_type, CAST(cnt AS BIGINT) AS cnt,
               CAST(ROUND(share, 6) AS DOUBLE) + 0.0 AS share,
               CAST(ROUND(cum_share, 6) AS DOUBLE) + 0.0 AS cum_share
        FROM ranked WHERE rk <= 5 ORDER BY rk
    """,
    tags=("relational", "window", "skew"),
)
def q100_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Heavy-hitter report: top-5 keys by frequency with each key's
    share and the running cumulative share — the skew diagnostic you
    run BEFORE keying a 100 TB shuffle on a column (a cum_share knee at
    rank 1–2 says "salt this key or cap it"). The shuffle-heavy part is
    one partial-agg count; the windows then run over the tiny per-key
    frame (single partition of |distinct keys| rows, fine for any
    realistic key cardinality — for billions of keys you'd pre-filter
    with a count threshold). Integer counts; shares rounded at 1e-6."""
    t = Tables(spark, sf)
    c = t.events.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    w_all = Window.partitionBy()
    w_ord = Window.partitionBy().orderBy(F.desc("cnt"), "event_type")
    ranked = c.select(
        "event_type",
        F.col("cnt").cast("bigint").alias("cnt"),
        (F.round(F.col("cnt") * F.lit(1.0) / F.sum("cnt").over(w_all), 6).cast("double") + F.lit(0.0)).alias("share"),
        (
            F.round(
                F.sum("cnt").over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
                * F.lit(1.0)
                / F.sum("cnt").over(w_all),
                6,
            ).cast("double")
            + F.lit(0.0)
        ).alias("cum_share"),
        F.row_number().over(w_ord).alias("rk"),
    )
    return ranked.filter(F.col("rk") <= 5).drop("rk").transform(ordered, F.desc("cnt"), "event_type")


@register(
    "q101_order_overlap_pairs",
    oracle="""
        WITH s AS (
            SELECT o_custkey, o_orderkey,
                   o_orderdate AS st,
                   o_orderdate + INTERVAL 7 DAY AS en
            FROM orders)
        SELECT a.o_custkey AS custkey,
               a.o_orderkey AS key_a, b.o_orderkey AS key_b,
               CAST(date_diff('day', greatest(a.st, b.st),
                              least(a.en, b.en)) AS BIGINT) AS overlap_days
        FROM s a
        JOIN s b ON a.o_custkey = b.o_custkey
                AND a.o_orderkey < b.o_orderkey
                AND a.st < b.en AND b.st < a.en
        ORDER BY custkey, key_a, key_b
    """,
    tags=("relational", "join", "interval"),
)
def q101_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Interval-overlap self-join: pairs of the SAME customer's orders
    whose 7-day fulfillment windows overlap (concurrent open orders —
    the double-spend/conflict shape). The scale discipline is the key
    choice: intervals equi-join on the entity key and apply the
    overlap predicate inside each bucket, so fan-out is bounded by
    per-key C(orders,2) and output stays linear in customers — a
    GLOBAL interval self-join on dense data is inherently quadratic
    OUTPUT and no physical trick fixes that (for keyless range joins,
    bin-bucket the time axis; the daily-stabbing q89 pattern covers
    occupancy counts). Overlap length in exact integer days."""
    t = Tables(spark, sf)
    # timestamp + INTERVAL, not date_add: date_add would TRUNCATE a
    # non-midnight timestamp to a date (silently shifting the interval
    # end) while the oracle's + INTERVAL keeps full precision — the
    # fixtures happen to be midnight-aligned, but the operator must not
    # depend on that
    s = t.orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("st"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("en"),
    )
    a = s.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("key_a"),
        F.col("st").alias("st_a"),
        F.col("en").alias("en_a"),
    )
    b = s.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("key_b"),
        F.col("st").alias("st_b"),
        F.col("en").alias("en_b"),
    )
    return (
        a.join(b, "custkey")
        .filter(
            (F.col("key_a") < F.col("key_b"))
            & (F.col("st_a") < F.col("en_b"))
            & (F.col("st_b") < F.col("en_a"))
        )
        .select(
            "custkey",
            "key_a",
            "key_b",
            F.datediff(
                F.least("en_a", "en_b").cast("date"),
                F.greatest("st_a", "st_b").cast("date"),
            ).cast("bigint").alias("overlap_days"),
        )
        .transform(ordered, "custkey", "key_a", "key_b")
    )


@register(
    "q102_equiheight_histogram",
    oracle="""
        WITH r AS (
            SELECT o_totalprice,
                   ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rk,
                   COUNT(*) OVER () AS n
            FROM orders)
        SELECT bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(ROUND(MIN(o_totalprice), 2) AS DOUBLE) + 0.0 AS lo,
               CAST(ROUND(MAX(o_totalprice), 2) AS DOUBLE) + 0.0 AS hi
        FROM (SELECT o_totalprice, CAST(((rk - 1) * 10) // n AS INT) + 1 AS bucket FROM r)
        GROUP BY bucket ORDER BY bucket
    """,
    tags=("relational", "window", "stats"),
)
def q102_equiheight(spark: SparkSession, sf: str) -> DataFrame:
    """Equi-HEIGHT histogram (10 equal-count buckets with their value
    bounds) — the complement of q67's equi-width bins and the shape
    optimizers and monitoring dashboards actually want (every bucket
    carries signal; equi-width collapses under skew).

    An equal-count bucketing needs a global rank; ``NTILE() OVER
    (ORDER BY ...)`` computes it in ONE task (WindowExec's
    single-partition warning — a non-starter at scale), so this uses
    :func:`operators.global_rank` — range exchange, per-partition
    row_number, broadcast offsets — and derives the bucket as
    ``(rank-1)·k DIV n`` (pure integer arithmetic, engine-identical;
    bucket sizes differ by ≤ 1 like NTILE, with the remainder spread
    Bresenham-style instead of front-loaded). The deterministic
    (value, key) tie-break makes bucket assignment — and therefore the
    hash — independent of where the sampled range boundaries fall."""
    from sparkflow_spark.operators import global_rank

    t = Tables(spark, sf)
    ranked = global_rank(
        t.orders.select("o_totalprice", "o_orderkey"),
        ["o_totalprice", "o_orderkey"],
        rank_col="rk",
    )
    n_total = t.orders.select(F.count(F.lit(1)).alias("_n"))
    b = ranked.crossJoin(F.broadcast(n_total)).select(
        "o_totalprice",
        (F.expr("CAST(((rk - 1) * 10) DIV _n AS INT)") + F.lit(1)).alias("bucket"),
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (F.round(F.min("o_totalprice"), 2).cast("double") + F.lit(0.0)).alias("lo"),
            (F.round(F.max("o_totalprice"), 2).cast("double") + F.lit(0.0)).alias("hi"),
        )
        .transform(ordered, "bucket")
    )


@register(
    "q104_join_key_skew",
    oracle="""
        WITH f AS (
            SELECT o_custkey AS k, COUNT(*) AS cnt
            FROM orders GROUP BY o_custkey
        ),
        s AS (
            SELECT SUM(cnt) * 1.0 AS n, COUNT(*) * 1.0 AS keys FROM f
        )
        SELECT CAST(s.n AS BIGINT) AS n_rows,
               CAST(s.keys AS BIGINT) AS n_keys,
               CAST(MAX(f.cnt) AS BIGINT) AS max_freq,
               CAST(ROUND(MAX(f.cnt) * s.keys / s.n, 4) AS DOUBLE) + 0.0
                 AS skew_ratio,
               CAST(SUM(CASE WHEN f.cnt > 2.0 * s.n / s.keys
                             THEN 1 ELSE 0 END) AS BIGINT) AS hot_keys,
               CAST(ROUND(SUM(-(f.cnt / s.n) * ln(f.cnt / s.n))
                          / ln(s.keys), 6) AS DOUBLE) + 0.0 AS entropy_norm
        FROM f, s
        GROUP BY s.n, s.keys
    """,
    tags=("relational", "stats", "skew"),
)
def q104_join_key_skew(spark: SparkSession, sf: str) -> DataFrame:
    """Join-key skew report — the diagnostic you run BEFORE a 100 TB
    fact-fact join to decide between a plain shuffle join, AQE
    skew-splitting, and explicit salting (operators.salted_join).

    One row summarizing the key distribution of ``orders.o_custkey``:
    row/key counts, the hottest key's frequency, ``skew_ratio`` =
    max_freq / mean_freq (1.0 = perfectly uniform; AQE's skew-join
    threshold reasons in exactly these terms), ``hot_keys`` = keys with
    more than 2x the mean frequency, and the Shannon entropy of the key
    distribution normalized to [0, 1] by ln(n_keys) (1.0 = uniform;
    low values mean a handful of keys carry the mass).

    Plan shape: partial-aggregable groupBy(key) -> per-key counts (the
    shuffle carries one row per key per map partition), a 1-row global
    stats frame broadcast back over the counts, and a second partial
    agg down to one row. Nothing is ever collected; the per-key count
    frame is the largest intermediate and it is |keys| rows.
    """
    t = Tables(spark, sf)
    f = t.orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    s = f.agg(
        (F.sum("cnt") * F.lit(1.0)).alias("n"),
        (F.count(F.lit(1)) * F.lit(1.0)).alias("keys"),
    )
    j = f.crossJoin(F.broadcast(s))
    p = F.col("cnt") / F.col("n")
    return (
        j.groupBy("n", "keys")
        .agg(
            F.max("cnt").alias("max_freq"),
            F.sum(
                F.when(F.col("cnt") > F.lit(2.0) * F.col("n") / F.col("keys"), 1)
                .otherwise(0)
            ).cast("bigint").alias("hot_keys"),
            F.sum(-p * F.log(p)).alias("h"),
        )
        .select(
            F.col("n").cast("bigint").alias("n_rows"),
            F.col("keys").cast("bigint").alias("n_keys"),
            F.col("max_freq").cast("bigint").alias("max_freq"),
            (
                F.round(F.col("max_freq") * F.col("keys") / F.col("n"), 4)
                .cast("double") + F.lit(0.0)
            ).alias("skew_ratio"),
            F.col("hot_keys"),
            (
                F.round(F.col("h") / F.log(F.col("keys")), 6).cast("double")
                + F.lit(0.0)
            ).alias("entropy_norm"),
        )
    )


@register(
    "q105_spearman_corr",
    oracle="""
        WITH r AS (
            SELECT l_returnflag,
                   RANK() OVER (PARTITION BY l_returnflag
                                ORDER BY l_quantity)
                     + (COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity)
                        - 1) / 2.0 AS rq,
                   RANK() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice)
                     + (COUNT(*) OVER (PARTITION BY l_returnflag,
                                                    l_extendedprice)
                        - 1) / 2.0 AS rp
            FROM lineitem
        )
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(ROUND(corr(rq, rp), 6) AS DOUBLE) + 0.0 AS spearman_rho
        FROM r GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("relational", "stats", "window"),
)
def q105_spearman(spark: SparkSession, sf: str) -> DataFrame:
    """Spearman rank correlation per group (quantity vs price within
    each returnflag) — the nonparametric complement of q99's Pearson r:
    robust to outliers and monotone-nonlinear relationships, the
    standard screen for "is this feature monotonically informative".

    Spearman = Pearson correlation of AVERAGE ranks (ties share the
    mean of their positional ranks). The scale-honest construction:

    1. unique positional ranks per group via :func:`operators.
       global_rank` (range exchange + per-partition row_number +
       broadcast offsets) with the (orderkey, linenumber) tiebreak —
       NOT ``RANK() OVER (PARTITION BY l_returnflag ...)``, whose 3-4
       partitions would each swallow a quarter of a 100 TB table in
       one task;
    2. average rank per (group, value) via a HIGH-cardinality window
       (AVG over the tie-group; ties hold consecutive row_numbers, so
       their mean IS rank + (ties-1)/2 — engine-identical integer
       arithmetic, which is what lets the hash match the oracle's
       RANK()+(cnt-1)/2 form);
    3. one partial-aggregable corr per group.
    """
    from sparkflow_spark.operators import global_rank

    t = Tables(spark, sf)
    base = t.lineitem.select(
        "l_returnflag", "l_quantity", "l_extendedprice",
        "l_orderkey", "l_linenumber",
    )
    rq = global_rank(
        base,
        ["l_quantity", "l_orderkey", "l_linenumber"],
        rank_col="rnq",
        group_cols=["l_returnflag"],
    )
    rp = global_rank(
        rq,
        ["l_extendedprice", "l_orderkey", "l_linenumber"],
        rank_col="rnp",
        group_cols=["l_returnflag"],
    )
    w_q = Window.partitionBy("l_returnflag", "l_quantity")
    w_p = Window.partitionBy("l_returnflag", "l_extendedprice")
    ranked = rp.select(
        "l_returnflag",
        F.avg("rnq").over(w_q).alias("rq"),
        F.avg("rnp").over(w_p).alias("rp"),
    )
    return (
        ranked.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (F.round(F.corr("rq", "rp"), 6).cast("double") + F.lit(0.0)).alias(
                "spearman_rho"
            ),
        )
        .transform(ordered, "l_returnflag")
    )


@register(
    "q106_rolling_zscore",
    oracle="""
        WITH w AS (
            SELECT user_id, event_id, value,
                   AVG(value) OVER win AS mu,
                   STDDEV_SAMP(value) OVER win AS sd,
                   COUNT(*) OVER win AS n_win
            FROM events
            WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        )
        SELECT user_id, event_id,
               CAST(ROUND(value, 4) AS DOUBLE) + 0.0 AS value,
               CAST(ROUND((value - mu) / sd, 4) AS DOUBLE) + 0.0 AS zscore
        FROM w
        WHERE n_win >= 10 AND sd > 0 AND abs((value - mu) / sd) > 2.0
        ORDER BY user_id, event_id
    """,
    tags=("relational", "stats", "window", "timeseries", "large-output"),
)
def q106_rolling_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling z-score anomaly detection — flag events whose value sits
    more than 2 sample standard deviations from the trailing-20-event
    mean of the SAME user. The batch twin of a streaming monitor: the
    trailing ROWS frame is what `applyInPandasWithState` would keep as
    per-key state; here it is one window spec Catalyst evaluates with
    a single hash exchange on user_id.

    Semantics pinned for cross-engine determinism: the frame is ROWS
    (not RANGE) over the total order (ts, event_id) — event_id breaks
    timestamp ties so both engines see byte-identical frames; a flag
    needs >= 10 events of history (n_win, counted over the same frame)
    so early-life noise is not scored; sd = 0 frames (constant series)
    emit nothing rather than +-inf.

    Scale: user_id is a HIGH-cardinality partition key (millions of
    users), so WindowExec parallelizes; the frame is O(20) per row —
    running-state evaluation, no per-row rescan. Contrast a
    low-cardinality PARTITION BY (q105's docstring) where the same
    syntax would serialize the table into a handful of tasks.
    """
    t = Tables(spark, sf)
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    dev = F.col("value") - F.avg("value").over(win)
    sd = F.stddev_samp("value").over(win)
    # ANSI-safe: guard the division instead of relying on x/0 -> NULL
    # (under ANSI mode a raw divide would raise DIVIDE_BY_ZERO)
    scored = t.events.select(
        "user_id",
        "event_id",
        "value",
        F.when(sd > 0, dev / sd).alias("_z"),
        F.count(F.lit(1)).over(win).alias("_n"),
    )
    return (
        scored.where((F.col("_n") >= 10) & F.col("_z").isNotNull()
                     & (F.abs(F.col("_z")) > 2.0))
        .select(
            "user_id",
            "event_id",
            dec4(F.col("value")).alias("value"),
            dec4(F.col("_z")).alias("zscore"),
        )
    )


@register(
    "q107_ewma_per_event",
    oracle="""
        WITH l AS (
            SELECT event_id, user_id, value,
                   LAG(value, 1) OVER w AS l1,
                   LAG(value, 2) OVER w AS l2,
                   LAG(value, 3) OVER w AS l3,
                   LAG(value, 4) OVER w AS l4
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT event_id, user_id,
               CAST(ROUND(
                 (value + 0.5 * COALESCE(l1, 0) + 0.25 * COALESCE(l2, 0)
                        + 0.125 * COALESCE(l3, 0) + 0.0625 * COALESCE(l4, 0))
                 / (1 + 0.5 * CASE WHEN l1 IS NULL THEN 0 ELSE 1 END
                      + 0.25 * CASE WHEN l2 IS NULL THEN 0 ELSE 1 END
                      + 0.125 * CASE WHEN l3 IS NULL THEN 0 ELSE 1 END
                      + 0.0625 * CASE WHEN l4 IS NULL THEN 0 ELSE 1 END),
                 6) AS DOUBLE) + 0.0 AS ewma
        FROM l ORDER BY event_id
    """,
    tags=("relational", "window", "timeseries", "smoothing", "large-output"),
)
def q107_ewma(spark: SparkSession, sf: str) -> DataFrame:
    """Exponentially-weighted moving average (α = 0.5, 5-tap) of each
    user's event values — the time-series smoothing primitive feeding
    anomaly scores (q106's z-score twin with decay) and forecast
    features. A truncated-tap EWMA instead of the recursive infinite
    form: recursion per key is not SQL-expressible and needs stateful
    streaming, while a 5-tap FIR with weights α^i is four LAGs over one
    (ts, event_id)-ordered window — bit-identical cross-engine because
    BOTH engines evaluate the identical left-to-right IEEE expression.
    Early-life rows renormalize over the taps that exist (a 2-event
    history averages over weights {1, 0.5}) rather than zero-padding,
    matching the streaming EWMA's warm-up behavior.

    Scale: one hash exchange on high-cardinality user_id, O(4) lag
    state per row — same running-state window evaluation as q106; no
    rescan, no per-key task serialization.
    """
    t = Tables(spark, sf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    l1, l2, l3, l4 = (F.lag("value", i).over(w) for i in (1, 2, 3, 4))
    num = (
        F.col("value")
        + F.lit(0.5) * F.coalesce(l1, F.lit(0))
        + F.lit(0.25) * F.coalesce(l2, F.lit(0))
        + F.lit(0.125) * F.coalesce(l3, F.lit(0))
        + F.lit(0.0625) * F.coalesce(l4, F.lit(0))
    )
    den = (
        F.lit(1)
        + F.lit(0.5) * l1.isNotNull().cast("int")
        + F.lit(0.25) * l2.isNotNull().cast("int")
        + F.lit(0.125) * l3.isNotNull().cast("int")
        + F.lit(0.0625) * l4.isNotNull().cast("int")
    )
    return t.events.select(
        "event_id",
        "user_id",
        (F.round(num / den, 6).cast("double") + F.lit(0.0)).alias("ewma"),
    )


@register(
    "q108_cumulative_new_users",
    oracle="""
        WITH first_seen AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS d
            FROM events GROUP BY user_id
        ),
        daily AS (
            SELECT d, COUNT(*) AS new_users FROM first_seen GROUP BY d
        )
        SELECT d, new_users,
               CAST(SUM(new_users) OVER (ORDER BY d) AS BIGINT) AS cum_users
        FROM daily ORDER BY d
    """,
    tags=("relational", "analytics", "window"),
)
def q108_cumulative_users(spark: SparkSession, sf: str) -> DataFrame:
    """Cumulative distinct-user growth curve — the running COUNT
    (DISTINCT) every dashboard wants, computed WITHOUT a distinct-over-
    window (which Spark rejects and which at scale would keep a
    per-frame dedup state): reduce each user to their FIRST-SEEN day
    (one partial-agg'd groupBy — the only shuffle that touches the
    event stream), roll up to daily new-user counts (|days| rows), and
    take a running sum over the tiny daily table. The running-sum
    window orders a bounded, days-sized frame, so the single-task
    window is fine (and the oracle's is identical)."""
    t = Tables(spark, sf)
    first_seen = t.events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d")
    )
    daily = first_seen.groupBy("d").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        daily.withColumn("cum_users", F.sum("new_users").over(w).cast("bigint"))
        .transform(ordered, "d")
    )


@register(
    "q109_interval_join_shipments",
    oracle="""
        WITH cnt AS (
            SELECT o.o_orderkey,
                   MIN(date_trunc('month', o.o_orderdate)) AS order_month,
                   COUNT(l.l_shipdate) AS hits
            FROM orders o
            LEFT JOIN lineitem l
              ON l.l_returnflag = 'R' AND l.l_quantity >= 45
             AND l.l_shipdate >= o.o_orderdate
             AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
            WHERE o.o_orderpriority = '1-URGENT'
            GROUP BY o.o_orderkey
        )
        SELECT CAST(order_month AS TIMESTAMP) AS order_month,
               COUNT(*) AS n_orders,
               CAST(SUM(hits) AS BIGINT) AS returned_shipments,
               CAST(ROUND(AVG(hits), 6) AS DOUBLE) + 0.0 AS avg_hits
        FROM cnt GROUP BY order_month ORDER BY order_month
    """,
    tags=("relational", "range_join"),
)
def q109(spark: SparkSession, sf: str) -> DataFrame:
    """Temporal range join via BIN EXPLOSION (operators.interval_join):
    heavy returned shipments landing inside each urgent order's first
    week, rolled up monthly. The oracle is the raw inequality join
    (DuckDB plans it as an IEJoin); Spark would plan that same
    predicate as BroadcastNestedLoopJoin — O(n*m) — so the engine path
    buckets both sides into 7-day bins and hash-joins on the bin id
    (<=2 bins per interval at this width), then re-checks the exact
    bounds. Zero-hit orders are kept by a second left join of the
    interval side onto the per-order counts (the binned join itself is
    inner)."""
    t = Tables(spark, sf)
    o = t.orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.col("o_orderdate").alias("w_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")).alias("w_end"),
    )
    pts = t.lineitem.filter(
        (F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 45)
    ).select(F.col("l_shipdate").alias("ship_ts"))
    pairs = operators.interval_join(
        pts, o, "ship_ts", "w_start", "w_end", bin_width=7 * 86400
    )
    per_order = pairs.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("_hits"))
    counted = (
        o.select("o_orderkey", "order_month")
        .join(per_order, "o_orderkey", "left")
        .select("order_month", F.coalesce("_hits", F.lit(0)).alias("hits"))
    )
    return counted.groupBy("order_month").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("hits").cast("bigint").alias("returned_shipments"),
        (F.round(F.avg("hits"), 6).cast("double") + F.lit(0.0)).alias("avg_hits"),
    ).transform(ordered, "order_month")


@register(
    "q110_overlap_join_congestion",
    oracle="""
        WITH u AS (
            SELECT o_orderkey AS k, o_orderdate AS s,
                   o_orderdate + INTERVAL 7 DAY AS e
            FROM orders WHERE o_orderpriority = '1-URGENT'
        )
        SELECT CAST(date_trunc('month', greatest(a.s, b.s)) AS TIMESTAMP)
                   AS order_month,
               COUNT(*) AS n_pairs,
               CAST(ROUND(AVG(date_diff('second', greatest(a.s, b.s),
                                        least(a.e, b.e)) / 3600.0), 6)
                    AS DOUBLE) + 0.0 AS avg_overlap_hours
        FROM u a JOIN u b
          ON a.k < b.k AND a.s < b.e AND b.s < a.e
        GROUP BY order_month ORDER BY order_month
    """,
    tags=("relational", "range_join"),
)
def q110(spark: SparkSession, sf: str) -> DataFrame:
    """KEYLESS interval-overlap self-join via bin explosion
    (operators.overlap_join) — the case q101's per-entity bucketing
    cannot handle: urgent-order fulfillment windows that overlap
    ANY other urgent window (fulfillment congestion), rolled up
    monthly. The oracle is the raw double-inequality join (DuckDB
    IEJoin); Spark's plan for that predicate is a nested loop, so the
    engine path replicates each 7-day window into its <=2 covering
    7-day bins, hash-joins on the bin id, and claims each pair in the
    single bin containing the later start (no post-join distinct).
    Monthly rollup keeps output bounded while the pair set stays the
    exact quadratic-output truth."""
    t = Tables(spark, sf)
    u = t.orders.filter(F.col("o_orderpriority") == "1-URGENT")
    a = u.select(
        F.col("o_orderkey").alias("k_a"),
        F.col("o_orderdate").alias("s_a"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")).alias("e_a"),
    )
    b = u.select(
        F.col("o_orderkey").alias("k_b"),
        F.col("o_orderdate").alias("s_b"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")).alias("e_b"),
    )
    pairs = operators.overlap_join(
        a, b, "s_a", "e_a", "s_b", "e_b", bin_width=7 * 86400
    ).where(F.col("k_a") < F.col("k_b"))
    late_start = F.greatest("s_a", "s_b")
    overlap_h = (
        F.least("e_a", "e_b").cast("long") - late_start.cast("long")
    ) / F.lit(3600.0)
    return (
        pairs.select(
            F.date_trunc("month", late_start).alias("order_month"),
            overlap_h.alias("_oh"),
        )
        .groupBy("order_month")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            (F.round(F.avg("_oh"), 6).cast("double") + F.lit(0.0)).alias(
                "avg_overlap_hours"
            ),
        )
        .transform(ordered, "order_month")
    )


@register(
    "q112_histogram_quantile_rollup",
    # Deterministic MERGEABLE quantile sketch: per-day equi-width
    # histograms over a FIXED domain (bin counts merge by addition —
    # the property percentile_approx partials lack across persisted
    # state), rolled to trailing-7-day p50/p95/p99 by inverse-CDF over
    # the merged counts. Every step is integer/power-of-two-exact
    # double math, so unlike the HLL row this sketch is fully
    # HASH-CHECKED cross-engine, not thresholded. Bin width 128 = 2^19
    # / 4096 (o_totalprice < 500k fits the domain; the top bin clamps
    # overflow); quantile estimate = the covering bin's upper edge, so
    # |est - exact| <= 128 by construction (pinned by t1).
    oracle="""
        WITH o AS (
            SELECT CAST(o_orderdate AS DATE) d, o_totalprice v FROM orders
        ),
        hist AS (
            SELECT d, LEAST(CAST(FLOOR(v / 128.0) AS INT), 4095) AS b,
                   COUNT(*) AS c
            FROM o GROUP BY 1, 2
        ),
        fan AS (
            SELECT d + CAST(x AS INTEGER) AS day, b, c
            FROM hist, range(7) t(x)
        ),
        m AS (SELECT day, b, CAST(SUM(c) AS BIGINT) AS c FROM fan GROUP BY 1, 2),
        cum AS (
            SELECT day, b, c,
                   SUM(c) OVER (PARTITION BY day ORDER BY b) AS cc,
                   SUM(c) OVER (PARTITION BY day) AS n
            FROM m
        ),
        q AS (
            SELECT day, CAST(MAX(n) AS BIGINT) AS n,
                   MIN(CASE WHEN cc >= 0.50 * n THEN b END) AS b50,
                   MIN(CASE WHEN cc >= 0.95 * n THEN b END) AS b95,
                   MIN(CASE WHEN cc >= 0.99 * n THEN b END) AS b99
            FROM cum GROUP BY day
        )
        SELECT day, n,
               CAST((b50 + 1) * 128.0 AS DOUBLE) + 0.0 AS p50,
               CAST((b95 + 1) * 128.0 AS DOUBLE) + 0.0 AS p95,
               CAST((b99 + 1) * 128.0 AS DOUBLE) + 0.0 AS p99
        FROM q ORDER BY day
    """,
    tags=("relational", "sketch", "incremental"),
)
def q112(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling-window quantiles from PERSISTED-MERGEABLE per-day
    histograms — the quantile sibling of q111's HLL rollup. At 100 TB
    the daily histogram table (days x <=4096 small rows) is the
    incremental state: a new day costs one partial agg + append, and
    ANY trailing window's p50/p95/p99 comes from summing bin counts —
    the order stream is never re-scanned. Merging is LOSSLESS by
    construction (addition), and the inverse-CDF estimate is exact to
    one bin width, so the whole pipeline — bin ids, merged counts,
    quantile edges — hash-matches a cross-engine replay."""
    t = Tables(spark, sf)
    w_bin = 128.0  # 2^19 / 4096 — exact in binary, so both engines bin identically
    o = t.orders.select(
        F.to_date("o_orderdate").alias("d"), F.col("o_totalprice").alias("v")
    )
    hist = o.groupBy(
        "d",
        F.least(F.floor(F.col("v") / F.lit(w_bin)).cast("int"), F.lit(4095)).alias("b"),
    ).agg(F.count(F.lit(1)).alias("c"))
    fan = hist.select(
        F.explode(F.sequence("d", F.date_add("d", 6))).alias("day"), "b", "c"
    )
    m = fan.groupBy("day", "b").agg(F.sum("c").alias("c"))
    cum = m.select(
        "day",
        "b",
        F.sum("c").over(Window.partitionBy("day").orderBy("b")).alias("cc"),
        F.sum("c").over(Window.partitionBy("day")).alias("n"),
    )

    def qb(frac):
        return F.min(F.when(F.col("cc") >= F.lit(frac) * F.col("n"), F.col("b")))

    return (
        cum.groupBy("day")
        .agg(
            F.max("n").alias("n"),
            qb(0.50).alias("b50"),
            qb(0.95).alias("b95"),
            qb(0.99).alias("b99"),
        )
        .select(
            "day",
            F.col("n").cast("bigint").alias("n"),
            (((F.col("b50") + 1) * F.lit(w_bin)).cast("double") + F.lit(0.0)).alias("p50"),
            (((F.col("b95") + 1) * F.lit(w_bin)).cast("double") + F.lit(0.0)).alias("p95"),
            (((F.col("b99") + 1) * F.lit(w_bin)).cast("double") + F.lit(0.0)).alias("p99"),
        )
        .transform(ordered, "day")
    )


@register(
    "q113_histogram_drift_tv",
    # Day-over-day distribution DRIFT from the same persisted per-day
    # histograms as q112 — the monitor a training-data pipeline runs
    # before a source poisons a mixture. Total-variation distance
    # instead of PSI: TV = sum|c1_i*N2 - c2_i*N1| / (2*N1*N2) stays in
    # EXACT integer arithmetic until one final division (PSI's logs
    # are engine-rounded transcendentals — a hash-check landmine), so
    # the whole pipeline is hash-checked, not thresholded.
    oracle="""
        WITH o AS (
            SELECT CAST(o_orderdate AS DATE) d, o_totalprice v FROM orders
        ),
        hist AS (
            SELECT d, LEAST(CAST(FLOOR(v / 128.0) AS INT), 4095) AS b,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM o GROUP BY 1, 2
        ),
        tot AS (SELECT d, CAST(SUM(c) AS BIGINT) AS n FROM hist GROUP BY d),
        pairs AS (
            SELECT a.d AS day, a.b,
                   a.c AS ca, COALESCE(h2.c, 0) AS cb
            FROM hist a
            LEFT JOIN hist h2 ON h2.d = a.d + 1 AND h2.b = a.b
            UNION ALL
            SELECT h2.d - 1 AS day, h2.b, 0 AS ca, h2.c AS cb
            FROM hist h2
            LEFT JOIN hist a ON a.d = h2.d - 1 AND a.b = h2.b
            WHERE a.d IS NULL
        ),
        agg AS (
            SELECT p.day,
                   CAST(SUM(ABS(p.ca * t2.n - p.cb * t1.n)) AS BIGINT) AS numer,
                   t1.n AS n1, t2.n AS n2
            FROM pairs p
            JOIN tot t1 ON t1.d = p.day
            JOIN tot t2 ON t2.d = p.day + 1
            GROUP BY p.day, t1.n, t2.n
        )
        SELECT day, n1, n2,
               CAST(ROUND(numer / (2.0 * n1 * n2), 6) AS DOUBLE) + 0.0 AS tv
        FROM agg ORDER BY day
    """,
    tags=("relational", "sketch", "quality"),
)
def q113(spark: SparkSession, sf: str) -> DataFrame:
    """Day-over-day total-variation drift between consecutive days'
    order-price distributions, computed ON the persisted histogram
    sketch (q112's state) — at 100 TB the monitor never touches the
    order stream, only the days x <=4096 counts table. TV in [0, 1] is
    exact: |c1*N2 - c2*N1| sums are 64-bit-integer-safe at these
    cardinalities and both engines divide once at the end. Days with
    no successor day emit nothing; bins present on either side
    contribute (missing side counts 0)."""
    t = Tables(spark, sf)
    w_bin = 128.0
    o = t.orders.select(
        F.to_date("o_orderdate").alias("d"), F.col("o_totalprice").alias("v")
    )
    hist = o.groupBy(
        "d",
        F.least(F.floor(F.col("v") / F.lit(w_bin)).cast("int"), F.lit(4095)).alias("b"),
    ).agg(F.count(F.lit(1)).alias("c"))
    tot = hist.groupBy("d").agg(F.sum("c").alias("n"))
    a = hist.select(F.col("d").alias("day"), "b", F.col("c").alias("ca"))
    nxt = hist.select(
        F.date_sub("d", 1).alias("day"), "b", F.col("c").alias("cb")
    )
    pairs = a.join(nxt, ["day", "b"], "full_outer").select(
        "day",
        "b",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    t1 = tot.select(F.col("d").alias("day"), F.col("n").alias("n1"))
    t2 = tot.select(F.date_sub("d", 1).alias("day"), F.col("n").alias("n2"))
    agg = (
        pairs.join(t1, "day")
        .join(t2, "day")
        .groupBy("day", "n1", "n2")
        .agg(F.sum(F.abs(F.col("ca") * F.col("n2") - F.col("cb") * F.col("n1"))).alias("numer"))
    )
    return agg.select(
        "day",
        "n1",
        "n2",
        (
            F.round(F.col("numer") / (F.lit(2.0) * F.col("n1") * F.col("n2")), 6).cast(
                "double"
            )
            + F.lit(0.0)
        ).alias("tv"),
    ).transform(ordered, "day")


@register(
    "q111_hll_rolling_distinct",
    oracle="""
        WITH ev AS (SELECT CAST(ts AS DATE) d, user_id FROM events),
        fan AS (
            SELECT d + CAST(x AS INTEGER) AS day, user_id
            FROM ev, range(7) t(x)
        ),
        ex AS (
            SELECT day, COUNT(DISTINCT user_id) AS exact_7d,
                   approx_count_distinct(user_id) AS est
            FROM fan GROUP BY day
        )
        SELECT day, exact_7d,
               CAST(ABS(est - exact_7d) <= 0.05 * exact_7d AS INT) AS ok
        FROM ex ORDER BY day
    """,
    tags=("relational", "sketch", "incremental"),
)
def q111(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental rolling distinct via PERSISTED-MERGEABLE HLL
    sketches (Spark 3.5+ Datasketches functions): one pass builds a
    days-sized sketch table (hll_sketch_agg, lgK=14), and any range
    union — here trailing 7 days — touches only sketch rows
    (hll_union_agg + estimate), never the event stream. This is the
    q89/q108 exact-rolling-distinct question answered the way a 100 TB
    deployment must: the daily sketch table is the incremental state
    (new day = one partial agg + append), and HLL merge is LOSSLESS —
    union-of-daily == single-pass-over-range, pinned exactly by t1.
    Sketch VALUES are engine-specific, so the driver-checkable form is
    q15's thresholded pattern: exact counts hash-match and each engine
    judges its own estimate against its own exact (both measured well
    inside 5%: Spark lgK=14 exact at fixture cardinalities, DuckDB
    worst 1.6%)."""
    t = Tables(spark, sf)
    ev = t.events.select(F.to_date("ts").alias("d"), "user_id")
    daily = ev.groupBy("d").agg(F.hll_sketch_agg("user_id", 14).alias("sk"))
    fan = daily.select(
        F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 6))).alias("day"),
        "sk",
    )
    est = fan.groupBy("day").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    ef = ev.select(
        F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 6))).alias("day"),
        "user_id",
    )
    exact = ef.groupBy("day").agg(F.countDistinct("user_id").alias("exact_7d"))
    return (
        exact.join(est, "day")
        .select(
            "day",
            "exact_7d",
            (F.abs(F.col("est") - F.col("exact_7d")) <= 0.05 * F.col("exact_7d"))
            .cast("int")
            .alias("ok"),
        )
        .transform(ordered, "day")
    )


_RECURSIVE_HIERARCHY_SQL = """
    WITH RECURSIVE chain(node, anc, depth) AS (
        SELECT c_custkey, c_custkey, 0 FROM customer
        UNION ALL
        SELECT node, CAST(FLOOR(anc / 2.0) AS BIGINT), depth + 1
        FROM chain WHERE anc > 1
    )
    SELECT node,
           CAST(MAX(depth) AS BIGINT) AS depth,
           CAST(SUM(anc) AS BIGINT) AS path_sum
    FROM chain GROUP BY node ORDER BY node
"""


@register(
    "q118_recursive_cte_hierarchy",
    oracle=_RECURSIVE_HIERARCHY_SQL,
    tags=("relational", "recursive-cte", "large-output"),
)
def q118(spark: SparkSession, sf: str) -> DataFrame:
    """RECURSIVE CTE — Spark 4's WITH RECURSIVE run natively by
    Catalyst (UnionLoop), hash-checked against DuckDB executing the
    IDENTICAL SQL text: every customer key walks its ancestor chain in
    the deterministic binary forest parent = floor(key/2) (the
    org-chart / category-tree rollup shape) and reports depth + the
    ancestor-path sum. Spark's recursion supports UNION ALL only
    (UNION-dedup recursion raises UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE
    — probed), so the walk is structured acyclic with a strictly
    decreasing ancestor: termination in ceil(log2(max key)) ≈ 17
    iterations at sf0.1, each iteration one join — the plan a 1000-
    executor cluster runs as log-depth rounds, never a driver loop."""
    register_views(spark, sf)
    return spark.sql(_RECURSIVE_HIERARCHY_SQL)


_SCRIPT_BAND_ORACLE = """
    WITH cand AS (
        SELECT k, 1000.0 * power(2, k) AS thr FROM range(0, 50) t(k)),
    counted AS (
        SELECT k, thr,
               (SELECT COUNT(*) FROM orders o
                WHERE o.o_totalprice > cand.thr) AS n
        FROM cand),
    pick AS (SELECT thr, n FROM counted WHERE n < 500 ORDER BY k LIMIT 1)
    SELECT o_orderpriority,
           CAST(pick.thr AS DOUBLE) + 0.0 AS threshold,
           pick.n AS n_above,
           COUNT(*) AS n_band,
           CAST(ROUND(SUM(o_totalprice), 2) AS DOUBLE) + 0.0 AS revenue
    FROM orders, pick
    WHERE o_totalprice > pick.thr / 2 AND o_totalprice <= pick.thr
    GROUP BY o_orderpriority, pick.thr, pick.n
    ORDER BY o_orderpriority
"""

_SCRIPT_BAND_SQL = """
BEGIN
  DECLARE thr DOUBLE DEFAULT 1000.0;
  DECLARE n BIGINT DEFAULT 0;
  SET n = (SELECT COUNT(*) FROM orders WHERE o_totalprice > thr);
  WHILE n >= 500 DO
    SET thr = thr * 2;
    SET n = (SELECT COUNT(*) FROM orders WHERE o_totalprice > thr);
  END WHILE;
  SELECT o_orderpriority,
         CAST(thr AS DOUBLE) + 0.0 AS threshold,
         n AS n_above,
         COUNT(*) AS n_band,
         CAST(ROUND(SUM(o_totalprice), 2) AS DOUBLE) + 0.0 AS revenue
  FROM orders
  WHERE o_totalprice > thr / 2 AND o_totalprice <= thr
  GROUP BY o_orderpriority ORDER BY o_orderpriority;
END
"""


@register(
    "q122_sql_scripting_while",
    oracle=_SCRIPT_BAND_ORACLE,
    tags=("relational", "sql-scripting"),
    memo=False,  # the WHILE loop's count probes execute eagerly at sql()
)
def q122(spark: SparkSession, sf: str) -> DataFrame:
    """SQL scripting (Spark 4 BEGIN...END, spark.sql.scripting.enabled):
    a WHILE loop with script-local DECLAREd variables doubles a price
    threshold until fewer than 500 orders exceed it (the engine executes
    the control flow — each loop probe is one distributed COUNT scan,
    log2(max/1000) iterations), then the final SELECT reads the LAST
    DOUBLING BAND (thr/2, thr] per priority — provably non-empty, since
    n(thr/2) >= 500 > n(thr) forces >= 500 - n(thr) rows into the band.
    Thresholds 1000*2^k are exact doubles and every loop decision is an
    integer count, so the data-dependent fixpoint is bit-reproducible —
    DuckDB replays it by picking the first k in the doubling series
    with n < 500 (no scripting needed) and must hash-match the script's
    result at every scale.

    100 TB shape: the driver holds two scalars; every probe and the
    final aggregation are ordinary distributed scans — control flow in
    the script never materializes data on the driver."""
    register_views(spark, sf)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql(_SCRIPT_BAND_SQL)


_EXEC_IMMEDIATE_ORACLE = """
    WITH c AS (SELECT MAX(o_totalprice) * 0.5 AS cutoff FROM orders)
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(ROUND(c.cutoff, 2) AS DOUBLE) + 0.0 AS cutoff,
           CAST(ROUND(SUM(o_totalprice), 2) AS DOUBLE) + 0.0 AS revenue
    FROM orders, c
    WHERE o_totalprice > c.cutoff
    GROUP BY o_orderpriority, c.cutoff
    ORDER BY o_orderpriority
"""


@register(
    "q123_session_variable_binding",
    oracle=_EXEC_IMMEDIATE_ORACLE,
    tags=("relational", "sql-scripting"),
    memo=False,  # DECLARE/SET VARIABLE are eager session mutations
)
def q123(spark: SparkSession, sf: str) -> DataFrame:
    """Session variables + EXECUTE IMMEDIATE (Spark 4): DECLARE OR
    REPLACE VARIABLE, SET VARIABLE from a scalar subquery over the data
    (half the max order price — exact double arithmetic, so the bound
    value is engine-reproducible), then EXECUTE IMMEDIATE a SQL string
    with a named :c parameter USING the variable — the administrative
    binding surface q121's spark.sql(args=...) python binding stops
    short of: here the parameterization lives entirely in SQL, the way
    an operations runbook or a stored procedure would drive it. DuckDB
    replays the same logic with an inline scalar CTE and must
    hash-match."""
    register_views(spark, sf)
    spark.sql("DECLARE OR REPLACE VARIABLE sfl_cutoff DOUBLE")
    spark.sql(
        "SET VARIABLE sfl_cutoff = (SELECT MAX(o_totalprice) * 0.5 FROM orders)"
    )
    return spark.sql(
        "EXECUTE IMMEDIATE "
        "'SELECT o_orderpriority, COUNT(*) AS n, "
        "CAST(ROUND(:c, 2) AS DOUBLE) + 0.0 AS cutoff, "
        "CAST(ROUND(SUM(o_totalprice), 2) AS DOUBLE) + 0.0 AS revenue "
        "FROM orders WHERE o_totalprice > :c "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority' "
        "USING sfl_cutoff AS c"
    )


_PIPE_ORACLE = """
    WITH agg AS (
        SELECT l_returnflag, l_linestatus,
               CAST(ROUND(SUM(l_quantity), 2) AS DOUBLE) + 0.0 AS sum_qty,
               CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                    AS DOUBLE) + 0.0 AS revenue,
               COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus)
    SELECT l_returnflag, l_linestatus, sum_qty, revenue, n,
           CAST(ROUND(revenue / n, 2) AS DOUBLE) + 0.0 AS rev_per_item
    FROM agg
    WHERE n > 10
    ORDER BY l_returnflag, l_linestatus
"""

# SQL pipe syntax (Spark 4): the same logic as a left-to-right pipeline.
# |> WHERE before the aggregate, |> AGGREGATE ... GROUP BY ..., a piped
# post-aggregate filter, |> EXTEND computing a derived column from the
# aggregate outputs, |> ORDER BY. DuckDB has no pipe syntax, so the
# oracle is the plain-SQL equivalent above — same math, same rounding.
_PIPE_SQL = """
    FROM lineitem
    |> WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    |> AGGREGATE
         CAST(ROUND(SUM(l_quantity), 2) AS DOUBLE) + 0.0 AS sum_qty,
         CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
              AS DOUBLE) + 0.0 AS revenue,
         COUNT(*) AS n
       GROUP BY l_returnflag, l_linestatus
    |> WHERE n > 10
    |> EXTEND CAST(ROUND(revenue / n, 2) AS DOUBLE) + 0.0 AS rev_per_item
    |> SELECT l_returnflag, l_linestatus, sum_qty, revenue, n, rev_per_item
    |> ORDER BY l_returnflag, l_linestatus
"""


@register(
    "q124_sql_pipe_syntax",
    oracle=_PIPE_ORACLE,
    tags=("relational", "sql-pipe"),
)
def q124(spark: SparkSession, sf: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 `|>` operators — the last Spark-4 SQL
    surface the r11 verdict named): the TPC-H Q1 shape written as a
    left-to-right pipeline — FROM |> WHERE |> AGGREGATE..GROUP BY |>
    WHERE (post-aggregate, no HAVING keyword needed) |> EXTEND (derived
    column over the aggregate outputs) |> SELECT |> ORDER BY. Catalyst
    plans it identically to the nested form (same scan/partial-agg/
    exchange pipeline — pipe syntax is parse-level sugar, zero plan
    cost), and DuckDB hash-matches via the plain-SQL equivalent."""
    register_views(spark, sf)
    return spark.sql(_PIPE_SQL)


_CMS_D, _CMS_W = 4, 64

_CMS_ORACLE = f"""
    WITH ev AS (
        SELECT CAST(ts AS DATE) AS d, user_id FROM events),
    cells AS (
        SELECT ev.d, j,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':cms' ||
                    CAST(j AS VARCHAR)), 1, 8))::UBIGINT % {_CMS_W} AS col,
               COUNT(*) AS cnt
        FROM ev, range(0, {_CMS_D}) t(j)
        GROUP BY 1, 2, 3),
    merged AS (
        SELECT j, col, SUM(cnt) AS cnt FROM cells GROUP BY j, col),
    probes AS (
        SELECT DISTINCT user_id FROM events WHERE user_id % 13 = 0),
    pc AS (
        SELECT p.user_id, t.j,
               ('0x' || substr(md5(CAST(p.user_id AS VARCHAR) || ':cms' ||
                    CAST(t.j AS VARCHAR)), 1, 8))::UBIGINT % {_CMS_W} AS col
        FROM probes p, range(0, {_CMS_D}) t(j)),
    est AS (
        SELECT pc.user_id, MIN(m.cnt) AS cms_est
        FROM pc JOIN merged m ON m.j = pc.j AND m.col = pc.col
        GROUP BY pc.user_id),
    exact AS (
        SELECT user_id, COUNT(*) AS exact_cnt FROM events
        WHERE user_id % 13 = 0 GROUP BY user_id)
    SELECT e.user_id, x.exact_cnt, CAST(e.cms_est AS BIGINT) AS cms_est,
           e.cms_est >= x.exact_cnt AS never_undercounts
    FROM est e JOIN exact x ON e.user_id = x.user_id
    ORDER BY e.user_id
"""


@register(
    "q125_count_min_rollup",
    oracle=_CMS_ORACLE,
    tags=("relational", "sketch", "mergeable"),
)
def q125(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable COUNT-MIN sketch rollup — the frequency-estimation
    member of the persisted-sketch family (X128 HLL = distinct, X133
    histogram = quantiles, this = point counts): per day, a d=4 x w=64
    integer sketch of user event counts (cell = md5-derived column per
    hash row — engine-portable, so unlike HLL the sketch VALUES
    themselves hash-check cross-engine); daily sketches merge by plain
    cell addition (CMS linearity — the 100 TB shape: the retained state
    is d*w integers per day, point queries touch d cells, the event
    stream is scanned once); estimates = min over hash rows, probed for
    the user_id % 13 cohort with the exact counts joined alongside and
    the CMS never-undercounts invariant emitted in-band."""
    t = Tables(spark, sf)
    ev = t.events.select(F.to_date("ts").alias("d"), "user_id")

    def cms_col(user: F.Column, j: F.Column) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            user.cast("string"), F.lit(":cms"), j.cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % _CMS_W
        )

    j = F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("j")
    cells = (
        ev.select("d", "user_id", j)
        .groupBy("d", "j", cms_col(F.col("user_id"), F.col("j")).alias("col"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    merged = cells.groupBy("j", "col").agg(F.sum("cnt").alias("cnt"))
    probes = (
        t.events.where(F.col("user_id") % 13 == 0).select("user_id").distinct()
    )
    probe_cells = probes.select(
        "user_id", F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("j")
    ).withColumn("col", cms_col(F.col("user_id"), F.col("j")))
    est = (
        probe_cells.join(F.broadcast(merged), ["j", "col"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("cms_est"))
    )
    exact = (
        t.events.where(F.col("user_id") % 13 == 0)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    return (
        est.join(exact, "user_id")
        .select(
            "user_id",
            "exact_cnt",
            F.col("cms_est").cast("bigint").alias("cms_est"),
            (F.col("cms_est") >= F.col("exact_cnt")).alias("never_undercounts"),
        )
        .transform(ordered, "user_id")
    )


@register(
    "q126_approx_top_k",
    # The oracle is the EXACT top-3 (this DuckDB build has no
    # approx_top_k): at fixture cardinality (5 event types, minimum
    # rank-3/rank-4 margin 2 at sf0.001, no ties at any SF) the Spark
    # sketch tracks every item exactly, so its top-3 set must equal
    # the exact top-3 — the sketch is checked against ground truth,
    # not against another sketch.
    oracle="""
        WITH cnt AS (
            SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1),
        top3 AS (
            SELECT event_type, n FROM cnt
            ORDER BY n DESC, event_type LIMIT 3)
        SELECT event_type, n FROM top3 ORDER BY event_type
    """,
    tags=("relational", "sketch"),
)
def q126(spark: SparkSession, sf: str) -> DataFrame:
    """approx_top_k (Spark 4.1's Datasketches frequent-items aggregate)
    — bounded-memory heavy hitters as ONE SQL aggregate, the built-in
    sibling of the hand-rolled X110 Misra-Gries operator: sketch the
    top-3 event types, then join exact counts for the sketched set.
    100 TB shape: the sketch is a fixed-size partial aggregate (no
    per-key state), merged map-side like any datasketch."""
    register_views(spark, sf)
    return spark.sql(
        """
        WITH tk AS (
            SELECT approx_top_k(event_type, 3) AS arr FROM events),
        items AS (
            SELECT DISTINCT s.item AS event_type
            FROM tk LATERAL VIEW explode(arr) AS s)
        SELECT e.event_type, COUNT(*) AS n
        FROM events e JOIN items i USING (event_type)
        GROUP BY e.event_type ORDER BY e.event_type
        """
    )


_LATERAL_SQL = """
    SELECT c.c_custkey, t.o_orderkey,
           CAST(ROUND(t.o_totalprice, 2) AS DOUBLE) + 0.0 AS o_price
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    WHERE c.c_custkey % 10 = 0
    ORDER BY c.c_custkey, o_price DESC, t.o_orderkey
"""


@register(
    "q127_lateral_topk",
    oracle=_LATERAL_SQL,
    tags=("relational", "sql", "lateral"),
)
def q127(spark: SparkSession, sf: str) -> DataFrame:
    """LATERAL correlated subquery (Spark 3.2+ lateral join): top-2
    orders per sampled customer via a correlated ORDER BY ... LIMIT
    subquery in FROM — the per-row-subquery surface q19's window
    formulation expresses differently; IDENTICAL SQL text runs on both
    engines (DuckDB executes LATERAL natively). Catalyst decorrelates
    to a ranked join, not a per-row loop — the same plan family as the
    TPC-H decorrelation guards."""
    register_views(spark, sf)
    return spark.sql(_LATERAL_SQL)


_GROUP_BY_ALL_SQL = """
    SELECT o_orderpriority, o_orderstatus,
           COUNT(*) AS n,
           CAST(ROUND(SUM(o_totalprice), 2) AS DOUBLE) + 0.0 AS revenue
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
"""


@register(
    "q128_group_by_all",
    oracle=_GROUP_BY_ALL_SQL,
    tags=("relational", "sql"),
)
def q128(spark: SparkSession, sf: str) -> DataFrame:
    """GROUP BY ALL + ORDER BY ALL (Spark 4 adopted DuckDB's shorthand:
    group on every non-aggregate select item, order on every output
    column) — IDENTICAL SQL text on both engines, pinning that the two
    engines resolve the implicit grouping/ordering lists the same
    way."""
    register_views(spark, sf)
    return spark.sql(_GROUP_BY_ALL_SQL)


# ---------------------------------------------------------------------------
# X185: the try_* ANSI-safe function family. Under Spark 4 defaults ANSI
# mode is ON (the driver's bare session — the repo's standing gotcha),
# so div-by-zero / overflow / bad parses THROW unless the try_ tier is
# used; these are the expressions a 100 TB pipeline wants NULL-safe.

_TRY_FAMILY_ORACLE = """
    SELECT o_orderkey AS okey,
           CASE WHEN o_custkey % 5 = 0 THEN NULL
                ELSE o_totalprice / (o_custkey % 5) END AS td,
           CASE WHEN o_orderkey % 20 = 8 THEN NULL
                ELSE 800 + (o_orderkey % 20) END AS ta,
           CASE WHEN o_custkey % 5 = 0 THEN NULL
                ELSE o_orderkey % (o_custkey % 5) END AS tmod,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS tnum_ok,
           TRY_CAST(substr(o_orderstatus, 1, 1) AS BIGINT) AS tnum_bad,
           str_split(o_orderpriority, '-')[2] AS telem_ok,
           str_split(o_orderpriority, '-')[3] AS telem_oob
    FROM orders
    ORDER BY okey
"""


@register(
    "q135_try_function_family",
    oracle=_TRY_FAMILY_ORACLE,
    tags=("relational", "functions", "large-output"),
)
def q135_try_function_family(spark: SparkSession, sf: str) -> DataFrame:
    """X185: try_divide / try_add / try_mod / try_to_number /
    try_element_at — every error leg LIVE in the data (divisor 0 on
    o_custkey%5=0 rows, bigint overflow on o_orderkey%20>7 rows,
    non-numeric parse on every order status, out-of-bounds element on
    every priority) and hash-checked against DuckDB CASE/TRY_CAST
    replays. Under ANSI mode (the driver's bare-session default) the
    non-try forms of all five THROW — this entry pins that the engine's
    NULL-safe tier computes the same values the oracle's explicit guards
    do."""
    t = Tables(spark, sf)
    pri_parts = F.split(F.col("o_orderpriority"), "-")
    return (
        t.orders.select(
            F.col("o_orderkey").alias("okey"),
            F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 5).alias("td"),
            # overflow leg fires on the %20==8 rows (5%) — live but not
            # dominant: try_add's NULL-on-overflow is JVM-exception-driven
            # per FIRING row (measured 49.7 s of a 52.7 s x64 run when 60%
            # of rows fired vs 0.14 s when none do — SCALE.md round-13c),
            # so a scale-safe pipeline keeps the error leg exceptional.
            F.try_add(
                F.when(F.col("o_orderkey") % 20 == 8, F.lit(9223372036854775800))
                .otherwise(F.lit(800)),
                F.col("o_orderkey") % 20,
            ).alias("ta"),
            F.try_mod(F.col("o_orderkey"), F.col("o_custkey") % 5).alias("tmod"),
            F.try_to_number(F.substring("o_orderpriority", 1, 1), F.lit("9"))
            .cast("long")
            .alias("tnum_ok"),
            F.try_to_number(F.substring("o_orderstatus", 1, 1), F.lit("9"))
            .cast("long")
            .alias("tnum_bad"),
            F.try_element_at(pri_parts, F.lit(2)).alias("telem_ok"),
            F.try_element_at(pri_parts, F.lit(3)).alias("telem_oob"),
        )
        # one output row per order: scales with input -> large-output,
        # NO single-partition final sort (driver compare is
        # order-insensitive; the x64 probe showed the sort dominating)
    )


# ---------------------------------------------------------------------------
# X186: linear interpolation of missing time-series values — the
# numeric sibling of X21's gap-fill/ffill (which carries the LAST
# value forward; sensor/metric pipelines want the line BETWEEN the
# neighbors). One window pass, no self-join.

_INTERP_ORACLE = """
    WITH src AS (
        SELECT user_id, event_id,
               row_number() OVER w AS pos,
               CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    ctx AS (
        SELECT user_id, event_id, pos, v,
               last_value(v IGNORE NULLS) OVER wp AS prev_v,
               last_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS)
                   OVER wp AS prev_pos,
               first_value(v IGNORE NULLS) OVER wf AS next_v,
               first_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS)
                   OVER wf AS next_pos
        FROM src
        WINDOW wp AS (PARTITION BY user_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY user_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT user_id, event_id,
           CASE WHEN v IS NOT NULL THEN v
                WHEN prev_v IS NULL THEN next_v
                WHEN next_v IS NULL THEN prev_v
                ELSE prev_v + (next_v - prev_v) *
                     ((pos - prev_pos) / (next_pos - prev_pos)) END AS v_interp,
           (v IS NULL) AS was_missing
    FROM ctx
    ORDER BY user_id, event_id
"""


@register(
    "q136_linear_interpolate",
    oracle=_INTERP_ORACLE,
    tags=("relational", "window", "timeseries", "large-output"),
)
def q136_linear_interpolate(spark: SparkSession, sf: str) -> DataFrame:
    """X186: per-user linear interpolation of missing metric values
    (every event_id % 3 == 0 masked): v = prev + (next − prev) ·
    (pos − prev_pos)/(next_pos − prev_pos) between the nearest
    non-null neighbors, carrying the edge value at head/tail runs.
    Spark's last/first(ignorenulls=True) over the growing/shrinking
    frames == DuckDB's IGNORE NULLS window forms; the arithmetic is
    written in the identical IEEE op order on both engines so the
    doubles hash exactly. Scale shape: ONE window exchange on user_id,
    both directional passes in the same partitioning, no self-join."""
    t = Tables(spark, sf)
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    src = t.events.select(
        "user_id",
        "event_id",
        F.row_number().over(wo).alias("pos"),
        F.when(F.col("event_id") % 3 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    pos_if_v = F.when(F.col("v").isNotNull(), F.col("pos"))
    ctx = src.select(
        "user_id",
        "event_id",
        "pos",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("prev_v"),
        F.last(pos_if_v, ignorenulls=True).over(wp).alias("prev_pos"),
        F.first("v", ignorenulls=True).over(wf).alias("next_v"),
        F.first(pos_if_v, ignorenulls=True).over(wf).alias("next_pos"),
    )
    frac = (F.col("pos") - F.col("prev_pos")) / (F.col("next_pos") - F.col("prev_pos"))
    return ctx.select(
        "user_id",
        "event_id",
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .otherwise(F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac)
        .alias("v_interp"),
        F.col("v").isNull().alias("was_missing"),
    )  # one row per event: large-output, unsorted by design


# ---------------------------------------------------------------------------
# X188: bitmap exact-distinct rollup — the bitmap_* aggregate family
# (Spark 3.5 datasketches-adjacent surface). This is how warehouse
# engines make EXACT distinct counts mergeable: a (group, bucket) bitmap
# is a fixed 4 KB value, bitmap_or_agg re-aggregates bitmaps instead of
# rescanning rows, and sum(bitmap_count) over buckets is the exact
# distinct — the exact sibling of X128's mergeable HLL rollup.

_BITMAP_ORACLE = """
    SELECT o_orderpriority AS pri,
           COUNT(DISTINCT o_custkey) AS distinct_direct,
           COUNT(DISTINCT o_custkey) AS distinct_merged
    FROM orders GROUP BY 1 ORDER BY pri
"""


@register(
    "q137_bitmap_distinct_rollup",
    oracle=_BITMAP_ORACLE,
    tags=("relational", "sketch", "agg"),
)
def q137_bitmap_distinct_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """X188: exact-distinct via the bitmap_* aggregate family, BOTH
    levels pinned against DuckDB COUNT(DISTINCT):

    - direct: group by (priority, bucket) → bitmap_construct_agg of
      bit positions → sum(bitmap_count) per priority;
    - merged: build FINER bitmaps per (priority, status, bucket), then
      re-aggregate with bitmap_or_agg across status — the mergeability
      contract (distinct over a coarser group from retained finer
      bitmaps, no row rescan) that makes exact distinct incremental at
      100 TB: a day's bitmaps are 4 KB × buckets, month rollup is OR.

    bitmap_bit_position needs positive inputs; custkey is shifted +1
    (min 0 in the fixtures) — a bijection, so distinct counts carry.
    """
    t = Tables(spark, sf)
    key = (F.col("o_custkey") + 1).alias("k")
    base = t.orders.select("o_orderpriority", "o_orderstatus", key)
    fine = base.groupBy(
        "o_orderpriority",
        "o_orderstatus",
        F.bitmap_bucket_number("k").alias("bucket"),
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("k")).alias("bm"))
    merged = (
        fine.groupBy("o_orderpriority", "bucket")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .groupBy("o_orderpriority")
        .agg(F.sum(F.bitmap_count("bm")).alias("distinct_merged"))
    )
    direct = (
        base.groupBy("o_orderpriority", F.bitmap_bucket_number("k").alias("bucket"))
        .agg(F.bitmap_construct_agg(F.bitmap_bit_position("k")).alias("bm"))
        .groupBy("o_orderpriority")
        .agg(F.sum(F.bitmap_count("bm")).alias("distinct_direct"))
    )
    return (
        direct.join(merged, "o_orderpriority")
        .select(
            F.col("o_orderpriority").alias("pri"),
            "distinct_direct",
            "distinct_merged",
        )
        .transform(ordered, "pri")
    )


# ---------------------------------------------------------------------------
# X189: ANSI interval arithmetic — year-month and day-time INTERVAL
# types as first-class values: constructor functions (make_ym_interval /
# make_dt_interval, including COLUMN-valued components), timestamp ±
# interval with month-end clamping, and unit-diff extraction. Outputs
# are cast back to portable timestamps/bigints so the hash compare sees
# engine-independent values; the interval TYPES live only mid-plan.

_INTERVAL_ORACLE = """
    SELECT o_orderkey AS okey,
           o_orderdate + INTERVAL 3 MONTH AS plus3m,
           o_orderdate - INTERVAL 14 MONTH AS minus1y2m,
           o_orderdate + INTERVAL '45 days 6 hours 30 minutes' AS due,
           o_orderdate + (o_orderkey % 5) * INTERVAL 1 DAY AS flex,
           date_diff('day', o_orderdate, o_orderdate + INTERVAL 3 MONTH) AS dgap,
           date_diff('hour', o_orderdate,
                     o_orderdate + INTERVAL '45 days 6 hours 30 minutes') AS hgap
    FROM orders
"""


@register(
    "q138_interval_arithmetic",
    oracle=_INTERVAL_ORACLE,
    tags=("relational", "datetime", "large-output"),
)
def q138_interval_arithmetic(spark: SparkSession, sf: str) -> DataFrame:
    """X189: ANSI intervals end to end — `+ INTERVAL '3' MONTH` takes the
    month-end-clamping path (Jan 31 + 1 month = Feb 28/29, pinned equal
    across engines on real order dates), make_ym_interval(1,2) subtracts
    14 months, make_dt_interval mixes day/hour/minute components AND
    accepts a per-row Column for the day component (the scheduling-
    pipeline shape: each row gets its own offset), and timestampdiff
    extracts day/hour gaps as bigints. One projection, zero shuffle,
    one output row per order (large-output, unsorted)."""
    t = Tables(spark, sf)
    od = F.col("o_orderdate")
    due = od + F.make_dt_interval(F.lit(45), F.lit(6), F.lit(30), F.lit(0))
    return t.orders.select(
        F.col("o_orderkey").alias("okey"),
        (od + F.expr("INTERVAL '3' MONTH")).alias("plus3m"),
        (od - F.make_ym_interval(F.lit(1), F.lit(2))).alias("minus1y2m"),
        due.alias("due"),
        (od + F.make_dt_interval(F.col("o_orderkey") % 5)).alias("flex"),
        F.expr(
            "timestampdiff(DAY, o_orderdate, o_orderdate + INTERVAL '3' MONTH)"
        ).alias("dgap"),
        F.expr(
            "timestampdiff(HOUR, o_orderdate,"
            " o_orderdate + INTERVAL '45 06:30' DAY TO MINUTE)"
        ).alias("hgap"),
    )  # one row per order: large-output, unsorted by design


# ---------------------------------------------------------------------------
# X193: TABLESAMPLE syntax forms + DataFrame.sample (the r12 verdict's
# named leftover). Sample MEMBERSHIP is engine-RNG-specific, so the
# cross-engine contract is the one the forms guarantee: ROWS-form count
# is exact, PERCENT/BUCKET/df.sample counts sit inside a 5-sigma
# binomial band around their expectation for a FIXED seed (REPEATABLE).
# Spark computes the booleans from its actual samples; the oracle
# derives them from the guarantee. Exact-membership sampling semantics
# are separately pinned by the md5-replay entries (q91/q78) and
# sampleBy by q33 — this row closes the SYNTAX surface.

_TABLESAMPLE_ORACLE = """
    WITH tot AS (SELECT COUNT(*) AS t FROM orders)
    SELECT form, ok, t AS total FROM tot, (VALUES
        ('bucket_1_of_10', TRUE),
        ('df_sample_10pct', TRUE),
        ('percent10', TRUE),
        ('rows200', TRUE)) v(form, ok)
    ORDER BY form
"""


@register(
    "q141_tablesample_forms",
    oracle=_TABLESAMPLE_ORACLE,
    tags=("relational", "sampling"),
)
def q141_tablesample_forms(spark: SparkSession, sf: str) -> DataFrame:
    """X193: TABLESAMPLE (10 PERCENT) REPEATABLE(42), TABLESAMPLE
    (200 ROWS), TABLESAMPLE (BUCKET 1 OUT OF 10) REPEATABLE(7), and
    DataFrame.sample(0.1, seed) — each form's count contract hash-
    checked: ROWS yields exactly min(200, total); the Bernoulli forms
    stay within 5σ of 0.1·total (binomial; holds for any partitioning
    the scan picks, so the bare driver session can't break it). All
    four samples are scan-time row filters — no shuffle, no collect."""
    register_views(spark, sf)
    t = Tables(spark, sf)
    sigma = "sqrt(t * 0.1 * 0.9)"
    sql_counts = spark.sql(
        f"""
        WITH tot AS (SELECT COUNT(*) AS t FROM orders),
        s_pct AS (SELECT COUNT(*) AS n FROM orders
                  TABLESAMPLE (10 PERCENT) REPEATABLE (42)),
        s_rows AS (SELECT COUNT(*) AS n FROM orders TABLESAMPLE (200 ROWS)),
        s_bkt AS (SELECT COUNT(*) AS n FROM orders
                  TABLESAMPLE (BUCKET 1 OUT OF 10) REPEATABLE (7))
        SELECT 'percent10' AS form,
               abs(s_pct.n - t * 0.1) <= 5 * {sigma} AS ok, t AS total
        FROM tot, s_pct
        UNION ALL
        SELECT 'rows200', s_rows.n = least(200, t), t FROM tot, s_rows
        UNION ALL
        SELECT 'bucket_1_of_10',
               abs(s_bkt.n - t * 0.1) <= 5 * {sigma}, t
        FROM tot, s_bkt
        """
    )
    df_n = t.orders.sample(fraction=0.1, seed=42).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = t.orders.agg(F.count(F.lit(1)).alias("t"))
    df_leg = df_n.crossJoin(tot).select(
        F.lit("df_sample_10pct").alias("form"),
        (
            F.abs(F.col("n") - F.col("t") * 0.1)
            <= 5 * F.sqrt(F.col("t") * 0.1 * 0.9)
        ).alias("ok"),
        F.col("t").alias("total"),
    )
    return sql_counts.unionByName(df_leg).transform(ordered, "form")


# ---------------------------------------------------------------------------
# X195: web-corpus URL analytics (parse_url) — provenance parsing for a
# C4-style web crawl: protocol/host/path/query-param/fragment pulled
# out of full URLs. The URLs are synthesized deterministically from
# document attributes IN-PLAN (ports on %3 rows, missing query on %5
# rows, fragments on %11 rows — every branch of the parser live), so
# the DuckDB replay can derive each component from the construction
# rule: the hash match pins parse∘render == id on every edge shape,
# the codec-entry pattern. HOST is pinned to EXCLUDE the port.

_URL_ORACLE = """
    SELECT doc_id,
           'https' AS proto,
           source || '.example.com' AS host,
           '/' || lang || '/doc-' || doc_id AS path,
           CASE WHEN doc_id % 5 != 0
                THEN 'ref=' || source || '&page=' || (doc_id % 7) END AS query,
           CASE WHEN doc_id % 5 != 0
                THEN CAST(doc_id % 7 AS BIGINT) END AS page,
           CASE WHEN doc_id % 11 = 0 THEN 'top' END AS frag
    FROM documents
"""


@register(
    "q142_url_analytics",
    oracle=_URL_ORACLE,
    tags=("relational", "functions", "large-output"),
)
def q142_url_analytics(spark: SparkSession, sf: str) -> DataFrame:
    """X195: parse_url over synthesized per-document URLs —
    PROTOCOL/HOST/PATH/QUERY plus keyed QUERY-param extraction (cast to
    long) and REF fragment; ports present on %3 rows (HOST must strip
    them), query absent on %5 rows (NULL, not empty), fragment on %11
    rows. Pure projection, zero shuffle, one row per document
    (large-output, unsorted)."""
    t = Tables(spark, sf)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(":8443")).otherwise(F.lit("")),
        F.lit("/"),
        F.col("lang"),
        F.lit("/doc-"),
        F.col("doc_id"),
        F.when(
            F.col("doc_id") % 5 != 0,
            F.concat(
                F.lit("?ref="), F.col("source"), F.lit("&page="), F.col("doc_id") % 7
            ),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0, F.lit("#top")).otherwise(F.lit("")),
    )
    d = t.documents.select("doc_id", url.alias("u"))
    return d.select(
        "doc_id",
        F.parse_url("u", F.lit("PROTOCOL")).alias("proto"),
        F.parse_url("u", F.lit("HOST")).alias("host"),
        F.parse_url("u", F.lit("PATH")).alias("path"),
        F.parse_url("u", F.lit("QUERY")).alias("query"),
        F.parse_url("u", F.lit("QUERY"), F.lit("page")).cast("long").alias("page"),
        F.parse_url("u", F.lit("REF")).alias("frag"),
    )  # one row per document: large-output, unsorted by design


# ---------------------------------------------------------------------------
# X196: the regexp function family breadth — regexp_count /
# regexp_substr / regexp_instr / regexp_extract(group) /
# regexp_extract_all / anchored rlike / global regexp_replace, all on
# real customer rows. DuckDB lacks regexp_instr and defaults
# regexp_replace to first-match; the replay emulates position via a
# lazy prefix capture and passes the 'g' flag — dialect differences a
# switch-user must know, encoded in the oracle.

@register(
    "q143_regexp_family",
    oracle="""
        SELECT c_custkey,
               CAST(len(regexp_extract_all(c_name, '[0-9]')) AS INT) AS n_digits,
               regexp_extract(c_name, '[1-9][0-9]*|0$', 0) AS first_sig,
               CAST(len(regexp_extract(c_name, '^(.*?)[0-9]', 1)) + 1 AS INT)
                   AS digit_pos,
               regexp_extract(c_name, 'Customer#([0-9]+)', 1) AS cust_id,
               regexp_replace(c_name, '[0-9]', '*', 'g') AS masked,
               regexp_matches(c_mktsegment, '^[A-Z]+$') AS seg_alpha
        FROM customer
    """,
    tags=("relational", "functions", "large-output"),
)
def q143_regexp_family(spark: SparkSession, sf: str) -> DataFrame:
    """X196: regexp_count (digit tally), regexp_substr (first non-zero
    digit run, with a '|0$' alternative so all-zero ids still match),
    regexp_instr (position of first digit), regexp_extract with a
    capture group, global regexp_replace masking, and an anchored
    rlike. One projection over customer, zero shuffle, one row per
    customer (large-output, unsorted)."""
    t = Tables(spark, sf)
    return t.customer.select(
        "c_custkey",
        F.regexp_count(F.col("c_name"), F.lit("[0-9]")).alias("n_digits"),
        F.regexp_substr(F.col("c_name"), F.lit("[1-9][0-9]*|0$")).alias("first_sig"),
        F.regexp_instr(F.col("c_name"), F.lit("[0-9]")).alias("digit_pos"),
        F.regexp_extract(F.col("c_name"), "Customer#([0-9]+)", 1).alias("cust_id"),
        F.regexp_replace(F.col("c_name"), "[0-9]", "*").alias("masked"),
        F.col("c_mktsegment").rlike("^[A-Z]+$").alias("seg_alpha"),
    )  # one row per customer: large-output, unsorted by design


# ---------------------------------------------------------------------------
# X197: observe()/Observation — pipeline health metrics collected as a
# SIDE EFFECT of the action the job already runs (no second scan): the
# accumulator-backed path a 100 TB ingest uses to audit row counts and
# value envelopes without paying another pass. The entry materializes
# the observed metrics as a 1-row frame hash-checked against a direct
# DuckDB aggregation — pinning that the observation lane computes
# exactly what a dedicated aggregation would have.

_OBSERVE_ORACLE = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
           MIN(o_totalprice) AS min_tp,
           MAX(o_totalprice) AS max_tp
    FROM orders
"""


@register(
    "q144_observe_metrics",
    oracle=_OBSERVE_ORACLE,
    tags=("relational", "observability"),
    memo=False,  # eager: runs the observed action on call
)
def q144_observe_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """X197: df.observe(Observation, ...) over the orders scan — count,
    long-exact key sum, and min/max price envelope ride the noop write
    as observed metrics (sum over longs, min/max over doubles: all
    accumulation-order-independent, so the values are exact and
    hash-comparable). Eager by design (memo=False): the observation
    only exists after an action."""
    from pyspark.sql import Observation

    t = Tables(spark, sf)
    obs = Observation(f"audit_{abs(hash(sf)) % 10**8}")
    observed = t.orders.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").alias("sum_key"),
        F.min("o_totalprice").alias("min_tp"),
        F.max("o_totalprice").alias("max_tp"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n"], m["sum_key"], m["min_tp"], m["max_tp"])],
        "n bigint, sum_key bigint, min_tp double, max_tp double",
    )


# ---------------------------------------------------------------------------
# X198: MERGEABLE approx-top-k rollup (approx_top_k_accumulate /
# _combine / _estimate — Spark 4.1 Datasketches frequent-items as
# VALUES): q126 pinned the one-shot form; this pins the three-phase
# lifecycle a 100 TB ingest needs — per-partition sketches persisted,
# combined WITHOUT rescanning rows, estimated at read time. Per-day
# event-type sketches are combined across each user cohort (user_id%4)
# and the combined estimate is checked against the EXACT cohort top-2
# (fixture cardinality: 5 types, maxItemsTracked 10 ≥ distinct items,
# so the sketch is exact and must equal ground truth — checked against
# truth, not another sketch).

_ATK_MERGE_ORACLE = """
    WITH cnt AS (
        SELECT user_id % 4 AS cohort, event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2),
    ranked AS (
        SELECT cohort, event_type, n,
               ROW_NUMBER() OVER (PARTITION BY cohort
                                  ORDER BY n DESC, event_type) AS r
        FROM cnt)
    SELECT cohort, event_type, n FROM ranked WHERE r <= 2
    ORDER BY cohort, event_type
"""


@register(
    "q145_approx_topk_merge",
    oracle=_ATK_MERGE_ORACLE,
    tags=("relational", "sketch"),
)
def q145_approx_topk_merge(spark: SparkSession, sf: str) -> DataFrame:
    """X198: accumulate per (cohort, day) → combine per cohort →
    estimate top-2. The day-level sketches are the persistable unit
    (fixed-size state per group); the combine step is sketch addition —
    no row rescan. Estimated (item, count) pairs exploded and
    hash-checked against the exact replay. Sketch top-2 ties broken by
    item for determinism (counts are exact at this cardinality)."""
    register_views(spark, sf)
    return spark.sql(
        """
        WITH day_sketch AS (
            SELECT user_id % 4 AS cohort, date_trunc('DAY', ts) AS d,
                   approx_top_k_accumulate(event_type, 10) AS sk
            FROM events GROUP BY 1, 2),
        cohort_sketch AS (
            SELECT cohort, approx_top_k_combine(sk, 10) AS sk
            FROM day_sketch GROUP BY cohort),
        est AS (
            SELECT cohort, explode(approx_top_k_estimate(sk, 5)) AS e
            FROM cohort_sketch),
        ranked AS (
            SELECT cohort, e.item AS event_type, e.count AS n,
                   ROW_NUMBER() OVER (PARTITION BY cohort
                                      ORDER BY e.count DESC, e.item) AS r
            FROM est)
        SELECT cohort, event_type, CAST(n AS BIGINT) AS n
        FROM ranked WHERE r <= 2
        ORDER BY cohort, event_type
        """
    )


# ---------------------------------------------------------------------------
# X202: schema-evolving union — unionByName(allowMissingColumns=True),
# the append shape when a new ingest batch carries added/dropped
# columns: name-based alignment (not positional), absent columns NULL-
# filled on either side. DuckDB replays with UNION ALL BY NAME.

_UBN_ORACLE = """
    SELECT * FROM (
        SELECT o_orderkey AS okey, o_orderstatus AS status, o_totalprice AS tp
        FROM orders WHERE o_orderkey % 3 = 0
        UNION ALL BY NAME
        SELECT o_orderkey AS okey, o_orderpriority AS pri
        FROM orders WHERE o_orderkey % 3 = 1
    )
"""


@register(
    "q146_union_by_name_missing",
    oracle=_UBN_ORACLE,
    tags=("relational", "set-op", "large-output"),
)
def q146_union_by_name_missing(spark: SparkSession, sf: str) -> DataFrame:
    """X202: two disjoint order slices with DIFFERENT schemas (one
    carries status+price, the other priority) unioned by NAME with
    missing columns NULL-filled — the batch-append path when the
    producer's schema evolved. Column order is name-aligned on both
    engines (the driver compare sorts columns by name anyway); narrow
    plan, zero shuffle, large-output."""
    t = Tables(spark, sf)
    a = t.orders.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("tp"),
    )
    b = t.orders.filter(F.col("o_orderkey") % 3 == 1).select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderpriority").alias("pri"),
    )
    return a.unionByName(b, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# X203: the ×256 probe's bitmap counter-finding, FIXED — bitmap
# exact-distinct state scales with key RANGE (bitmap_bit_position
# buckets by value), so sparse/shifted key domains balloon the retained
# bitmaps (SCALE.md round-13h: 15.7× wall for 4× rows). The production
# remedy: remap keys to DENSE ranks first with the scale-safe two-phase
# global_rank (X113 — range exchange + per-partition row_number +
# broadcast offsets; no single-partition window), then bitmap the dense
# ids. Distinct counts are invariant under the bijection, which is
# exactly what the unchanged COUNT(DISTINCT) oracle pins.

_BITMAP_DENSE_ORACLE = """
    SELECT o_orderpriority AS pri,
           COUNT(DISTINCT o_custkey) AS distinct_dense
    FROM orders GROUP BY 1 ORDER BY pri
"""


@register(
    "q147_bitmap_dense_remap",
    oracle=_BITMAP_DENSE_ORACLE,
    tags=("relational", "sketch", "agg"),
)
def q147_bitmap_dense_remap(spark: SparkSession, sf: str) -> DataFrame:
    """X203: dense-remap bitmap distinct — distinct custkeys ranked
    1..n by global_rank (dense by construction), joined back (a
    key-sized shuffle join, deliberately NOT broadcast — the dictionary
    is corpus-sized at 100 TB), bitmaps built over the dense ids:
    bucket count is now ⌈cardinality/32768⌉ regardless of the raw key
    domain's sparseness. Same COUNT DISTINCT oracle as X188's direct
    level — the bijection invariance is the contract."""
    from sparkflow_spark.operators import global_rank

    t = Tables(spark, sf)
    base = t.orders.select(
        "o_orderpriority", (F.col("o_custkey") + 1).alias("k")
    )
    dense = global_rank(base.select("k").distinct(), ["k"], rank_col="dk")
    remapped = base.join(dense, "k")
    return (
        remapped.groupBy(
            "o_orderpriority", F.bitmap_bucket_number("dk").alias("bucket")
        )
        .agg(F.bitmap_construct_agg(F.bitmap_bit_position("dk")).alias("bm"))
        .groupBy("o_orderpriority")
        .agg(F.sum(F.bitmap_count("bm")).alias("distinct_dense"))
        .select(F.col("o_orderpriority").alias("pri"), "distinct_dense")
        .transform(ordered, "pri")
    )
