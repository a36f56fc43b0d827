"""Array / map / struct / UDF surface — SURVEY.md §2c Q31, Q32, Q40."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from sparkflow_spark.catalog import Tables
from sparkflow_spark.functions.vector import dot
from sparkflow_spark.queries import ordered, register
from sparkflow_spark.queries.relational import dec2


@register(
    "q31_array_size_invariants",
    oracle="""
        SELECT label, COUNT(*) AS c, CAST(SUM(len(embedding)) AS BIGINT) AS s
        FROM embeddings GROUP BY label ORDER BY label
    """,
    tags=("functions", "array"),
)
def q31a(spark: SparkSession, sf: str) -> DataFrame:
    """Array size invariants per label (embedding dim is fixed → s = c·dim)."""
    t = Tables(spark, sf)
    return (
        t.embeddings.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.size("embedding")).cast("bigint").alias("s"),
        )
        .transform(ordered, "label")
    )


@register(
    "q31_array_dot_norm",
    oracle="""
        SELECT vec_id,
               CAST(ROUND(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 2)
                 AS DOUBLE) + 0.0 AS nrm2
        FROM embeddings ORDER BY vec_id
    """,
    tags=("functions", "array", "vector"),
)
def q31b(spark: SparkSession, sf: str) -> DataFrame:
    """Higher-order-function dot product (‖v‖² per vector), double math on
    both engines so accumulation is bit-comparable."""
    t = Tables(spark, sf)
    return (
        t.embeddings.select("vec_id", dec2(dot("embedding", "embedding")).alias("nrm2"))
        .transform(ordered, "vec_id")
    )


@register(
    "q32_struct_map_access",
    oracle="""
        SELECT event_id, user_id AS uid, event_type AS et, 1 AS mv
        FROM events ORDER BY event_id
    """,
    tags=("functions", "struct", "map", "large-output",),
)
def q32(spark: SparkSession, sf: str) -> DataFrame:
    """Build struct + map in-engine, then access fields/keys — the oracle
    checks the round-trip collapses to the raw values."""
    t = Tables(spark, sf)
    built = t.events.select(
        "event_id",
        F.struct(F.col("user_id").alias("u"), F.col("event_type").alias("e")).alias("st"),
        F.create_map(F.lit("a"), F.lit(1), F.lit("b"), F.lit(2)).alias("mp"),
    )
    return built.select(
        "event_id",
        F.col("st.u").alias("uid"),
        F.col("st.e").alias("et"),
        F.col("mp").getItem("a").alias("mv"),
    )


@register(
    "q40_pandas_udf_scalar",
    oracle="""
        SELECT event_id, CAST(ROUND(value * 2, 2) AS DOUBLE) + 0.0 AS v2
        FROM events ORDER BY event_id
    """,
    tags=("functions", "udf", "large-output",),
)
def q40(spark: SparkSession, sf: str) -> DataFrame:
    """Arrow-vectorized scalar pandas_udf — the engine's sanctioned slow
    path (reference's equivalent was row-pickled mapPartitions,
    reference tensorflow_async.py:99)."""
    t = Tables(spark, sf)

    @F.pandas_udf(T.DoubleType())
    def double_it(v: pd.Series) -> pd.Series:
        return v * 2.0

    return (
        t.events.select("event_id", dec2(double_it(F.col("value"))).alias("v2"))
    )


@register(
    "q40_grouped_map_applyinpandas",
    oracle="""
        SELECT event_id,
               CAST(ROUND(value / AVG(value) OVER (PARTITION BY event_type), 4)
                 AS DOUBLE) + 0.0 AS v_norm
        FROM events ORDER BY event_id
    """,
    tags=("functions", "udf", "udtf"),
)
def q40c(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-map applyInPandas (the UDTF-ish surface, SURVEY.md §2a
    note): per event_type, normalize value by the group mean inside a
    pandas function — oracle is the equivalent window expression."""
    t = Tables(spark, sf)

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        m = pdf["value"].mean()
        return pd.DataFrame({"event_id": pdf["event_id"], "v_norm": pdf["value"] / m})

    out = t.events.select("event_id", "event_type", "value").groupBy("event_type").applyInPandas(
        normalize, schema="event_id long, v_norm double"
    )
    return out.select(
        "event_id", (F.round("v_norm", 4).cast("double") + F.lit(0.0)).alias("v_norm")
    )


@register(
    "q40_python_udtf_lateral",
    oracle="""
        SELECT doc_id, COUNT(*) AS c FROM (
            SELECT doc_id,
                   unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                                      x -> x != '')) AS tok
            FROM documents) t
        GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("functions", "udtf"),
)
def q40d(spark: SparkSession, sf: str) -> DataFrame:
    """A real Python UDTF (Spark ≥3.5 table function) used via LATERAL
    join in SQL — one row out per token; docs with zero tokens produce
    no rows on both engines."""
    from sparkflow_spark.catalog import register_views

    @F.udtf(returnType="tok: string")
    class SplitTokens:
        def eval(self, text: str):
            if text:
                for t in text.split():
                    yield (t,)

    register_views(spark, sf)
    spark.udtf.register("split_tokens", SplitTokens)
    return spark.sql(
        """
        SELECT doc_id, COUNT(*) AS c
        FROM documents, LATERAL split_tokens(text)
        GROUP BY doc_id ORDER BY doc_id
        """
    )


@register(
    "q40_map_in_arrow",
    oracle="""
        SELECT event_id, CAST(ROUND(value * 3, 2) AS DOUBLE) + 0.0 AS v3
        FROM events ORDER BY event_id
    """,
    tags=("functions", "udf", "arrow", "large-output",),
)
def q40e(spark: SparkSession, sf: str) -> DataFrame:
    """mapInArrow: the lowest-overhead Python exchange — RecordBatches
    in/out, no pandas conversion. Used when the Python side is itself
    Arrow-native (pyarrow compute, polars, DuckDB-in-worker)."""
    import pyarrow as pa

    t = Tables(spark, sf)

    def triple(batches):
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            import pyarrow.compute as pc

            yield pa.RecordBatch.from_arrays(
                [tbl.column("event_id").combine_chunks(), pc.multiply(tbl.column("value").combine_chunks(), 3.0)],
                names=["event_id", "v3"],
            )

    out = t.events.select("event_id", "value").mapInArrow(triple, schema="event_id long, v3 double")
    return out.select("event_id", dec2(F.col("v3")).alias("v3"))


@register(
    "q40_cogroup_applyinpandas",
    oracle="""
        SELECT COALESCE(e.k, o.k) AS k,
               COALESCE(e.n_events, 0) AS n_events,
               COALESCE(o.n_orders, 0) AS n_orders
        FROM (SELECT user_id AS k, COUNT(*) AS n_events FROM events GROUP BY 1) e
        FULL JOIN (SELECT o_custkey AS k, COUNT(*) AS n_orders FROM orders GROUP BY 1) o
          ON e.k = o.k
        ORDER BY k
    """,
    tags=("functions", "udf", "cogroup"),
)
def q40f(spark: SparkSession, sf: str) -> DataFrame:
    """cogroup().applyInPandas — the custom two-sided grouped operator:
    events and orders cogrouped on their key, merged per-key in pandas.
    Oracle is the equivalent FULL JOIN of group counts.

    r13 (guide §4.2): cogroup on a BUCKET of the key, not the raw key —
    applyInPandas pays ~1 ms of fixed Python/pandas overhead per GROUP
    invocation, so 15 k distinct keys cost ~18 s in per-key calls while
    moving only 250 k longs. Bucketing to 64 groups keeps the same
    FlatMapCoGroupsInPandas plan and the same per-key counts (each
    key's rows land in exactly one bucket on both sides — pmod of the
    key), but the per-key merge becomes two vectorized value_counts
    inside each bucket: 64 boundary crossings instead of 15 k.
    Measured isolated at sf0.1: steady 18.4 s → sub-second."""
    t = Tables(spark, sf)
    nb = 64  # buckets: enough for core balance, invariant to key count
    ev = t.events.select(
        F.col("user_id").alias("k"), F.pmod("user_id", F.lit(nb)).alias("_b")
    )
    od = t.orders.select(
        F.col("o_custkey").alias("k"), F.pmod("o_custkey", F.lit(nb)).alias("_b")
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        ne = left["k"].value_counts()
        no = right["k"].value_counts()
        keys = ne.index.union(no.index)
        return pd.DataFrame(
            {
                "k": keys.to_numpy(dtype="int64"),
                "n_events": ne.reindex(keys, fill_value=0).to_numpy(dtype="int64"),
                "n_orders": no.reindex(keys, fill_value=0).to_numpy(dtype="int64"),
            }
        )

    out = ev.groupBy("_b").cogroup(od.groupBy("_b")).applyInPandas(
        merge, schema="k long, n_events long, n_orders long"
    )
    return out.transform(ordered, "k")


@register(
    "q40_grouped_agg_pandas_udf",
    oracle="""
        SELECT event_type, CAST(ROUND(AVG(value), 2) AS DOUBLE) + 0.0 AS av
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("functions", "udf", "agg"),
)
def q40b(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-aggregate pandas_udf (UDAF surface)."""
    t = Tables(spark, sf)

    @F.pandas_udf(T.DoubleType())
    def mean_udaf(v: pd.Series) -> float:
        return float(v.mean())

    return (
        t.events.groupBy("event_type")
        .agg(dec2(mean_udaf(F.col("value"))).alias("av"))
        .transform(ordered, "event_type")
    )


# ---------------------------------------------------------------------------
# VARIANT semi-structured surface (Spark 4, r10 verdict ask #5)


@register(
    "q116_variant_extract",
    oracle="""
        SELECT event_id,
               CAST(props->>'$.k' AS INT) AS k,
               CAST(NULL AS INT) AS miss
        FROM events ORDER BY event_id
    """,
    tags=("relational", "functions", "json", "variant", "large-output"),
)
def q116(spark: SparkSession, sf: str) -> DataFrame:
    """VARIANT extraction over the real JSON column (Spark 4
    ``parse_json`` → binary VARIANT → ``variant_get`` path+cast) — the
    shredded-at-scan successor to Q30's string-walking
    ``get_json_object``: parse once, extract many, no re-tokenizing per
    path. ``try_variant_get`` on a missing path returns NULL (the
    error-tolerant leg; the throwing/coercion legs are pinned by t1).
    Dialect split per Q30's template: DuckDB replays with ``->>``.
    Scan pruning survives the VARIANT plan — ReadSchema carries only
    (event_id, props), asserted by the plan t1."""
    t = Tables(spark, sf)
    return t.events.select("event_id", F.parse_json("props").alias("v")).select(
        "event_id",
        F.expr("variant_get(v, '$.k', 'int')").alias("k"),
        F.expr("try_variant_get(v, '$.missing', 'int')").alias("miss"),
    )


@register(
    "q117_variant_nested_roundtrip",
    oracle="""
        SELECT o_orderkey,
               o_custkey AS cust,
               CAST(o_orderkey % 3 AS INT) AS f1,
               CAST(NULL AS INT) AS status_int,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders ORDER BY o_orderkey
    """,
    tags=("relational", "functions", "json", "variant", "large-output"),
)
def q117(spark: SparkSession, sf: str) -> DataFrame:
    """VARIANT nested-object + array-index extraction, verified against
    GROUND TRUTH rather than another JSON engine: build a nested JSON
    doc per order (object, sub-object, array, int fields), parse to
    VARIANT, extract through '$.ids.cust', '$.flags[1]' and
    '$.price_cents' — the results must equal the source columns the doc
    was built from, so any drift in path navigation, array indexing or
    numeric round-trip shows as a hash mismatch. try_variant_get of a
    non-numeric string as int → NULL (cast-failure leg on real data).
    Integer-only payloads keep the doc bit-exact on both engines."""
    t = Tables(spark, sf)
    j = F.format_string(
        '{"status":"%s","ids":{"order":%d,"cust":%d},"flags":[%d,%d],'
        '"price_cents":%d}',
        F.col("o_orderstatus"),
        F.col("o_orderkey"),
        F.col("o_custkey"),
        (F.col("o_orderkey") % 2).cast("long"),
        (F.col("o_orderkey") % 3).cast("long"),
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"),
    )
    return t.orders.select("o_orderkey", F.parse_json(j).alias("v")).select(
        "o_orderkey",
        F.expr("variant_get(v, '$.ids.cust', 'bigint')").alias("cust"),
        F.expr("variant_get(v, '$.flags[1]', 'int')").alias("f1"),
        F.expr("try_variant_get(v, '$.status', 'int')").alias("status_int"),
        F.expr("variant_get(v, '$.price_cents', 'bigint')").alias("cents"),
    )


@register(
    "q119_arrow_udf_scalar",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                    AS BIGINT) AS net_cents
        FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
    tags=("functions", "udf", "arrow", "large-output"),
)
def q119(spark: SparkSession, sf: str) -> DataFrame:
    """Spark 4.1 ``@arrow_udf`` — the pyarrow-native scalar UDF tier
    (operates on ``pa.Array`` directly; no pandas materialization
    between Arrow and user code, unlike ``@pandas_udf``). Same net-
    price kernel as the q40 pandas twin, computed with pyarrow compute
    so the whole lane stays columnar. (Kernel lives in
    functions/arrow_kernels.py — arrow_udf needs REAL type hints, and
    this module's ``from __future__ import annotations`` stringifies
    them into UNSUPPORTED_SIGNATURE.)"""
    from sparkflow_spark.functions.arrow_kernels import net_price

    t = Tables(spark, sf)
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        # exact integer cents: ROUND(x, 2) is tie-broken differently per
        # engine on doubles; floor(x*100+0.5) is bit-deterministic given
        # the identical IEEE product both engines compute
        F.floor(
            net_price(F.col("l_extendedprice"), F.col("l_discount")) * 100 + 0.5
        )
        .cast("bigint")
        .alias("net_cents"),
    )


@register(
    "q120_collation_lcase_group",
    oracle="""
        SELECT lower(o_orderpriority) AS pri, COUNT(*) AS c,
               CAST(ROUND(SUM(o_totalprice), 2) AS DOUBLE) + 0.0 AS tp
        FROM orders GROUP BY 1 ORDER BY 1
    """,
    tags=("relational", "collation"),
)
def q120(spark: SparkSession, sf: str) -> DataFrame:
    """COLLATION surface (Spark 4 UTF8_LCASE): group case-MANGLED
    priorities under a case-insensitive collation — Catalyst's
    collation-aware hash agg must merge 'URGENT'/'urgent'/'Urgent'
    buckets natively (no lower() in the Spark plan; the mangling uses
    initcap on odd keys so the raw strings genuinely differ). DuckDB
    replays with explicit lower(). Output is canonicalized to
    lowercase for the compare — grouping itself ran on the collated
    values."""
    t = Tables(spark, sf)
    mangled = t.orders.select(
        F.when(
            F.col("o_orderkey") % 2 == 1, F.initcap("o_orderpriority")
        )
        .otherwise(F.col("o_orderpriority"))
        .alias("pri_raw"),
        "o_totalprice",
    )
    return (
        mangled.select(
            F.expr("pri_raw COLLATE UTF8_LCASE").alias("pri_c"), "o_totalprice"
        )
        .groupBy("pri_c")
        .agg(F.count(F.lit(1)).alias("c"), dec2(F.sum("o_totalprice")).alias("tp"))
        .select(F.lower(F.col("pri_c")).alias("pri"), "c", "tp")
        .transform(ordered, "pri")
    )


@register(
    "q121_parameterized_sql",
    oracle="""
        SELECT o_orderstatus, COUNT(*) AS c
        FROM orders
        WHERE o_totalprice > 150000.0 AND o_orderpriority = '1-URGENT'
        GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("relational", "sql-api"),
)
def q121(spark: SparkSession, sf: str) -> DataFrame:
    """PARAMETERIZED SQL (spark.sql(..., args={...})) — named-parameter
    binding, the injection-safe way to template queries; the literals
    never enter the SQL text on the Spark side. DuckDB replays with the
    values inlined."""
    from sparkflow_spark.catalog import register_views

    register_views(spark, sf)
    return spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS c
        FROM orders
        WHERE o_totalprice > :minp AND o_orderpriority = :pri
        GROUP BY o_orderstatus ORDER BY o_orderstatus
        """,
        args={"minp": 150000.0, "pri": "1-URGENT"},
    )


# ---------------------------------------------------------------------------
# X190: map-typed higher-order functions — the map algebra surface
# (transform_values / map_filter / map_zip_with / map_concat /
# map_contains_key plus an aggregate() fold over map_values). Maps are
# the natural carrier for per-entity feature dictionaries in a training
# pipeline; every derived value is re-exploded to plain columns so the
# whole algebra is hash-checked against a DuckDB group-by replay.

_MAP_HOF_ORACLE = """
    WITH per AS (
        SELECT user_id, event_type AS etype,
               COUNT(*) AS cnt, MIN(value) AS mv
        FROM events GROUP BY 1, 2
    )
    SELECT user_id, etype, cnt,
           cnt * 2 AS doubled,
           mv / cnt AS ratio,
           cnt >= 2 AS kept,
           CAST(SUM(cnt) OVER (PARTITION BY user_id) AS BIGINT) AS utotal
    FROM per
"""


@register(
    "q139_map_hof_algebra",
    oracle=_MAP_HOF_ORACLE,
    tags=("functions", "map", "large-output"),
)
def q139_map_hof_algebra(spark: SparkSession, sf: str) -> DataFrame:
    """X190: per-user event-type maps built with map_from_entries, then
    pushed through the map HOF family — transform_values (×2),
    map_filter (cnt≥2 keep-set), map_zip_with (min-value/count ratio;
    min not sum, so no float accumulation-order dependence), map_concat
    + element_at (a '__all' synthetic key carrying the per-user total),
    aggregate() folding map_values, and map_contains_key for the keep
    test. Exploded back to (user_id, etype) rows for the oracle
    compare. One shuffle (the groupBy); the map algebra itself is all
    JVM expressions on grouped rows."""
    t = Tables(spark, sf)
    per = t.events.groupBy("user_id", F.col("event_type").alias("etype")).agg(
        F.count(F.lit(1)).alias("cnt"), F.min("value").alias("mv")
    )
    maps = per.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("etype", "cnt"))).alias("cmap"),
        F.map_from_entries(F.collect_list(F.struct("etype", "mv"))).alias("mmap"),
    )
    total = F.aggregate(
        F.map_values("cmap"), F.lit(0).cast("long"), lambda a, x: a + x
    )
    enriched = maps.select(
        "user_id",
        "cmap",
        F.transform_values("cmap", lambda k, v: v * 2).alias("dmap"),
        F.map_filter("cmap", lambda k, v: v >= 2).alias("kmap"),
        F.map_zip_with("mmap", "cmap", lambda k, m, c: m / c).alias("rmap"),
        F.element_at(
            F.map_concat("cmap", F.create_map(F.lit("__all"), total)),
            "__all",
        ).alias("utotal"),
    )
    return enriched.select(
        "user_id",
        F.explode("cmap").alias("etype", "cnt"),
        "dmap",
        "kmap",
        "rmap",
        "utotal",
    ).select(
        "user_id",
        "etype",
        "cnt",
        F.element_at("dmap", F.col("etype")).alias("doubled"),
        F.element_at("rmap", F.col("etype")).alias("ratio"),
        F.map_contains_key("kmap", F.col("etype")).alias("kept"),
        "utotal",
    )  # one row per (user, etype): large-output, unsorted by design


# ---------------------------------------------------------------------------
# X191: row generators — posexplode_outer with a LIVE null leg and
# sequence() with a per-row bound folded by aggregate(). DuckDB has no
# WITH ORDINALITY; the replay builds {pos, part} structs with
# list_apply over range(len(...)) and LEFT JOIN LATERAL UNNEST so the
# null leg yields the same single all-NULL generator row.

_GENERATORS_ORACLE = """
    WITH src AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 != 0
                    THEN str_split(o_orderpriority, '-') END AS parts,
               o_orderkey % 3 + 1 AS k
        FROM orders
    )
    SELECT s.o_orderkey AS okey,
           CAST(u.x['pos'] AS BIGINT) AS pos,
           u.x['part'] AS part,
           CAST(s.k AS INT) AS n_seq,
           CAST(s.k * (s.k + 1) // 2 AS BIGINT) AS sum_seq
    FROM src s
    LEFT JOIN LATERAL (
        SELECT UNNEST(list_apply(range(len(s.parts)),
                                 i -> {'pos': i, 'part': s.parts[i + 1]})) AS x
    ) u ON TRUE
"""


@register(
    "q140_row_generators",
    oracle=_GENERATORS_ORACLE,
    tags=("functions", "generator", "large-output"),
)
def q140_row_generators(spark: SparkSession, sf: str) -> DataFrame:
    """X191: posexplode_outer over split order priorities — every 7th
    order's array is NULLed so the _outer contract (one all-NULL
    generator row instead of dropping the parent) is live and
    hash-checked — alongside sequence(1, k) with a per-row k∈{1,2,3}
    whose sum is folded by aggregate() and pinned against the closed
    form k(k+1)/2. Pure narrow generators: zero shuffle, output rows =
    Σ per-row part counts (large-output, unsorted)."""
    t = Tables(spark, sf)
    parts = F.when(
        F.col("o_orderkey") % 7 != 0, F.split("o_orderpriority", "-")
    )
    seq = F.sequence(F.lit(1).cast("long"), F.col("o_orderkey") % 3 + 1)
    staged = t.orders.select(
        F.col("o_orderkey").alias("okey"),
        parts.alias("parts"),
        F.size(seq).alias("n_seq_raw"),
        F.aggregate(seq, F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "sum_seq"
        ),
    )
    return staged.select(
        "okey",
        F.posexplode_outer("parts").alias("pos_raw", "part"),
        "n_seq_raw",
        "sum_seq",
    ).select(
        "okey",
        F.col("pos_raw").cast("long").alias("pos"),
        "part",
        F.col("n_seq_raw").alias("n_seq"),
        "sum_seq",
    )  # ~2 rows per order: large-output, unsorted by design
