"""Training-data pipeline surface #2 — contamination detection, PII
redaction, column profiling, unigram LM scoring, TF-IDF, batch MERGE,
sessionization, time-series gap fill, PageRank. All but PageRank are
oracle-checked (t2): those operators are pure Catalyst compositions, so
a DuckDB SQL twin exists for each; PageRank's float power iteration is
engine-defined → rows-only driver check + numpy-oracle pytest.

Reference parity note: the reference engine (lifeomic/sparkflow) has no
data-pipeline surface at all — these operators come from the north-star
brief's LLM-pipeline inventory, not from reference files.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from sparkflow_spark import dedup
from sparkflow_spark.catalog import Tables
from sparkflow_spark.functions.text import lower_tokens, redact_pii
from sparkflow_spark.operators import frequent_item_pairs, profile
from sparkflow_spark.queries import ordered, register


# ---------------------------------------------------------------------------
# contamination: eval docs (doc_id % 10 == 0) vs the train remainder

_CONTAM_CTES = """
    toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                           x -> x != '') AS toks
        FROM documents),
    sh AS (
        SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id,
                   CASE WHEN len(toks) >= 3 THEN
                        list_transform(range(1, len(toks) - 1),
                            i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
                   ELSE [array_to_string(toks, ' ')] END AS shingles
            FROM toks
        ) base, UNNEST(base.shingles) AS u(shingle)),
    train_universe AS (
        SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 <> 0),
    ev AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 10 = 0)
"""


@register(
    "c_contamination",
    oracle=f"""
        WITH {_CONTAM_CTES}
        SELECT ev.doc_id,
               COUNT(*) AS n_shingles,
               COUNT(tu.shingle) AS n_hits,
               CAST(ROUND(COUNT(tu.shingle) * 1.0 / COUNT(*), 3) AS DOUBLE) + 0.0
                 AS contamination
        FROM ev LEFT JOIN train_universe tu ON ev.shingle = tu.shingle
        GROUP BY ev.doc_id
        ORDER BY ev.doc_id
    """,
    tags=("pipeline", "dedup", "join"),
)
def c_contamination(spark: SparkSession, sf: str) -> DataFrame:
    """Eval-set contamination: per eval doc (doc_id % 10 == 0), the
    fraction of its distinct 3-word shingles present anywhere in the
    train split (the other 90%). See dedup.ngram_contamination for the
    scale contract (train side collapses to a distinct shingle universe
    before the join)."""
    t = Tables(spark, sf)
    docs = t.documents
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    return (
        dedup.ngram_contamination(train, ev, shingle_k=3)
        .transform(ordered, "doc_id")
    )


@register(
    "p_decontaminate_keep",
    oracle=f"""
        WITH {_CONTAM_CTES.replace("train_universe", "eval_universe")
              .replace("WHERE doc_id % 10 <> 0", "WHERE doc_id % 10 = 0")
              .replace("ev AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 10 = 0)",
                       "tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 10 <> 0)")},
        scored AS (
            SELECT tr.doc_id,
                   CAST(ROUND(COUNT(eu.shingle) * 1.0 / COUNT(*), 3) AS DOUBLE) + 0.0
                     AS contamination
            FROM tr LEFT JOIN eval_universe eu ON tr.shingle = eu.shingle
            GROUP BY tr.doc_id)
        SELECT doc_id, contamination FROM scored
        WHERE contamination < 0.2 ORDER BY doc_id
    """,
    tags=("pipeline", "dedup", "join"),
)
def p_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Train-side DECONTAMINATION (the GPT-3/Pile hygiene step
    c_contamination only measures): drop every training document whose
    distinct-shingle overlap with the EVAL split reaches 20%, returning
    the keep-list with scores. Same kernel as the detector with the
    roles swapped — the eval split collapses to its distinct shingle
    universe (the tiny side, broadcastable), the 90% train side pays
    one shingle-keyed left join, per-doc rollup on train ids. At 100 TB
    this direction is the one that matters: the universe is eval-sized,
    so the big corpus is scanned once and never self-joined."""
    t = Tables(spark, sf)
    docs = t.documents
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    scored = dedup.ngram_contamination(ev, train, shingle_k=3)
    return (
        scored.filter(F.col("contamination") < 0.2)
        .select("doc_id", (F.col("contamination") + F.lit(0.0)).alias("contamination"))
        .transform(ordered, "doc_id")
    )


# ---------------------------------------------------------------------------
# PII redaction. The fixture corpus carries no PII-shaped spans, so the
# query enriches each doc with a deterministic footer BUILT FROM FIXTURE
# COLUMNS on both engines (same SQL-expressible concat), then redacts.
# The operator under test is redact_pii; the footer is harness, keeping
# the regex chain non-vacuous (every row exercises all four patterns).


@register(
    "t_pii_redact",
    oracle="""
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       text || ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@mail.example.com or http://example.com/u/'
                            || CAST(doc_id AS VARCHAR) || ' phone 555-01'
                            || CAST(doc_id % 10 AS VARCHAR) || '-'
                            || CAST(1000 + doc_id % 9000 AS VARCHAR)
                            || ' ssn ' || CAST(100000000 + doc_id AS VARCHAR),
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                     'https?://[^\\s]+', '<URL>', 'g'),
                   '\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b', '<PHONE>', 'g'),
                 '\\b[0-9]{9,}\\b', '<ID>', 'g') AS redacted
        FROM documents ORDER BY doc_id
    """,
    tags=("pipeline", "text"),
)
def t_pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    """PII scrub via the redact_pii regexp_replace chain (map-only,
    codegen'd). Driver hash covers the full redacted text of every doc."""
    t = Tables(spark, sf)
    did = F.col("doc_id")
    enriched = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        did.cast("string"),
        F.lit("@mail.example.com or http://example.com/u/"),
        did.cast("string"),
        F.lit(" phone 555-01"),
        (did % 10).cast("string"),
        F.lit("-"),
        (did % 9000 + 1000).cast("string"),
        F.lit(" ssn "),
        (did + 100000000).cast("string"),
    )
    return t.documents.select(
        "doc_id", redact_pii(enriched).alias("redacted")
    ).transform(ordered, "doc_id")


# ---------------------------------------------------------------------------
# column profiling: lineitem numeric measures + a string key, one scan


_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag"]


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_COLS:
        parts.append(f"""
        SELECT '{c}' AS column_name,
               COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(ROUND(MIN(TRY_CAST({c} AS DOUBLE)), 4) AS DOUBLE) + 0.0 AS min_d,
               CAST(ROUND(MAX(TRY_CAST({c} AS DOUBLE)), 4) AS DOUBLE) + 0.0 AS max_d,
               CAST(ROUND(AVG(TRY_CAST({c} AS DOUBLE)), 4) AS DOUBLE) + 0.0 AS mean_d
        FROM lineitem""")
    return " UNION ALL ".join(parts) + " ORDER BY column_name"


@register(
    "p_profile_lineitem",
    oracle=_profile_oracle(),
    tags=("pipeline", "agg"),
)
def p_profile(spark: SparkSession, sf: str) -> DataFrame:
    """operators.profile over lineitem: the DuckDB twin is p UNION ALL
    scans, the Spark side is ONE scan (multi-distinct Expand + stack
    unpivot) — the profiling shape you want against 100 TB. Min/max/mean
    rounded to 4 for the cross-engine float compare; l_returnflag (a
    string) pins the try_cast→NULL contract."""
    t = Tables(spark, sf)
    prof = profile(t.lineitem, _PROFILE_COLS)
    return prof.select(
        "column_name",
        "n_rows",
        "n_nulls",
        "n_distinct",
        F.round("min_d", 4).cast("double").alias("min_d"),
        F.round("max_d", 4).cast("double").alias("max_d"),
        F.round("mean_d", 4).cast("double").alias("mean_d"),
    ).transform(ordered, "column_name")


# ---------------------------------------------------------------------------
# unigram LM scoring


@register(
    "t_unigram_logprob",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(list_filter(
                       string_split_regex(lower(trim(text)), '\\s+'),
                       x -> x != '')) AS tok
            FROM documents),
        vocab AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
        tot AS (SELECT SUM(c) AS s FROM vocab)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(ROUND(AVG(ln(v.c / t.s)), 3) AS DOUBLE) + 0.0 AS avg_logprob
        FROM toks JOIN vocab v USING (tok), tot t
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    tags=("pipeline", "text", "agg"),
)
def t_unigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-fit quality score: train a unigram LM on the corpus itself
    (token → count / total), score each doc by mean token log-prob.
    Low-scoring docs are OOD junk (the cheap perplexity proxy used for
    corpus filtering).

    Shape at 100 TB: tokens explode once; the vocabulary aggregation is
    map-side combined (vocab ≪ corpus); the scalar total rides a 1-row
    broadcast; the token→vocab join broadcasts the vocab (AQE) so the
    exploded stream never shuffles; the per-doc rollup is the only wide
    exchange, keyed on doc_id."""
    t = Tables(spark, sf)
    toks = t.documents.select(
        "doc_id", F.explode(lower_tokens("text")).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("s"))
    scored = (
        toks.join(F.broadcast(vocab), "tok")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.avg(F.log(F.col("c") / F.col("s"))), 3)
            .cast("double")
            .alias("avg_logprob"),
        )
    )
    return scored.transform(ordered, "doc_id")


# ---------------------------------------------------------------------------
# batch MERGE (upsert + delete) and sessionization


@register(
    "q60_merge_upsert",
    oracle="""
        WITH src AS (
            SELECT o_orderkey, 'REPRICED' AS o_orderstatus,
                   CAST(FLOOR(o_totalprice * 1.1 * 100 + 0.5) AS BIGINT)
                     AS price_cents,
                   (o_orderkey % 13 = 1) AS _deleted
            FROM orders WHERE o_orderkey % 7 = 0)
        SELECT o_orderkey, o_orderstatus, price_cents
        FROM (
            SELECT t.o_orderkey, t.o_orderstatus,
                   CAST(FLOOR(t.o_totalprice * 100 + 0.5) AS BIGINT)
                     AS price_cents
            FROM orders t
            WHERE NOT EXISTS (SELECT 1 FROM src s
                              WHERE s.o_orderkey = t.o_orderkey)
            UNION ALL
            SELECT o_orderkey, o_orderstatus, price_cents
            FROM src WHERE NOT _deleted) m
        ORDER BY o_orderkey
    """,
    tags=("pipeline", "join"),
)
def q60_merge_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """MERGE semantics on plain parquet via operators.merge_upsert:
    every 7th order repriced (update), every 13th-of-those dropped
    (matched delete), the rest untouched. The anti-join broadcasts the
    source KEY SET, so the big target never shuffles — see the operator
    docstring for the 100 TB contract."""
    from sparkflow_spark.operators import merge_upsert

    t = Tables(spark, sf)
    # per-row integer-cents quantization (FLOOR(x*100 + 0.5), the
    # tpch_q9 contract): ROUND(double, 2) is HALF_UP on Spark but
    # round-half-even territory on DuckDB at exact .005 boundaries,
    # which x*1.1 does produce
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    target = t.orders.select(
        "o_orderkey", "o_orderstatus", cents.alias("price_cents")
    )
    src = t.orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("REPRICED").alias("o_orderstatus"),
        F.floor(F.col("o_totalprice") * 1.1 * 100 + 0.5)
        .cast("bigint")
        .alias("price_cents"),
        (F.col("o_orderkey") % 13 == 1).alias("_deleted"),
    )
    merged = merge_upsert(target, src, ["o_orderkey"], delete_col="_deleted")
    return merged.transform(ordered, "o_orderkey")


@register(
    "q61_sessionize",
    oracle="""
        WITH marked AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                > 21600000000
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        sid AS (
            SELECT user_id, ts,
                   SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS session_id
            FROM marked)
        SELECT user_id,
               CAST(session_id AS BIGINT) AS session_id,
               CAST(epoch_us(MIN(ts)) AS BIGINT) AS start_us,
               CAST(epoch_us(MAX(ts)) AS BIGINT) AS end_us,
               COUNT(*) AS n_events
        FROM sid
        GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
    tags=("pipeline", "window"),
)
def q61_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Batch sessionization of the events stream, 6-hour inactivity gap
    — operators.sessionize (one exchange for both windows + the
    rollup). The boundary predicate is exact integer microseconds, so
    the session split is bit-identical cross-engine."""
    from sparkflow_spark.operators import sessionize

    t = Tables(spark, sf)
    sess = sessionize(t.events, "user_id", "ts", gap_minutes=360)
    return sess.select(
        "user_id",
        F.col("session_id").cast("bigint").alias("session_id"),
        F.unix_micros("session_start").alias("start_us"),
        F.unix_micros("session_end").alias("end_us"),
        "n_events",
    ).transform(ordered, "user_id", "session_id")


# ---------------------------------------------------------------------------
# TF-IDF top terms per document


@register(
    "t_tfidf_top_terms",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(list_filter(
                       string_split_regex(lower(trim(text)), '\\s+'),
                       x -> x != '')) AS tok
            FROM documents),
        tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
        dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        n AS (SELECT COUNT(*) AS nn FROM documents)
        SELECT doc_id, tok, tf, df,
               CAST(ROUND(tf * ln(nn * 1.0 / df), 3) AS DOUBLE) + 0.0 AS tfidf
        FROM (
            SELECT tf.doc_id, tf.tok, tf.tf, dfreq.df, n.nn,
                   ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                      ORDER BY tf.tf DESC, dfreq.df ASC, tf.tok)
                     AS rn
            FROM tf JOIN dfreq USING (tok), n) ranked
        WHERE rn <= 3
        ORDER BY doc_id, tok
    """,
    tags=("pipeline", "text", "window"),
)
def t_tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 characteristic terms per document by TF-IDF. The RANKING
    key is pure integers (tf DESC, df ASC, tok) — never the float score
    — so the selected rows are deterministic cross-engine; the float
    tfidf value is carried rounded, for consumers.

    Shape at 100 TB: tf is a map-side-combined (doc, tok) agg; df
    aggregates the (already tiny) tf table by token; the df join
    broadcasts (vocab ≪ corpus); the per-doc top-k runs through one
    window whose WindowGroupLimit pre-prunes to k rows per doc map-side
    before the final exchange."""
    t = Tables(spark, sf)
    from pyspark.sql import Window

    toks = t.documents.select("doc_id", F.explode(lower_tokens("text")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = t.documents.agg(F.count(F.lit(1)).alias("nn"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("tok")
    )
    ranked = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(F.broadcast(n))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )
    return ranked.select(
        "doc_id",
        "tok",
        "tf",
        "df",
        F.round(F.col("tf") * F.log(F.col("nn") / F.col("df")), 3)
        .cast("double")
        .alias("tfidf"),
    ).transform(ordered, "doc_id", "tok")


# ---------------------------------------------------------------------------
# time-series gap fill + forward fill


@register(
    "q62_gap_fill_ffill",
    oracle="""
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS h,
                   SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS cents
            FROM events WHERE user_id % 5 = 0
            GROUP BY user_id, date_trunc('hour', ts)),
        bounds AS (
            SELECT user_id, MIN(h) AS mn, MAX(h) AS mx
            FROM hourly GROUP BY user_id),
        grid AS (
            SELECT user_id,
                   UNNEST(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
            FROM bounds)
        SELECT g.user_id,
               CAST(epoch_us(g.h) AS BIGINT) AS grid_us,
               CAST(last_value(hourly.cents IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cents
        FROM grid g
        LEFT JOIN hourly ON hourly.user_id = g.user_id AND hourly.h = g.h
        ORDER BY g.user_id, grid_us
    """,
    tags=("pipeline", "window", "timeseries"),
)
def q62_gap_fill(spark: SparkSession, sf: str) -> DataFrame:
    """Dense hourly grid per user (users ≡ 0 mod 5) with forward-filled
    integer-cents sums — operators.gap_fill_ffill. Cents keep the fill
    values exactly comparable; the grid is generated key-locally so the
    dense series never crosses the network unfilled."""
    from sparkflow_spark.operators import gap_fill_ffill

    t = Tables(spark, sf)
    ev = t.events.filter(F.col("user_id") % 5 == 0).withColumn(
        "cents", F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    )
    filled = gap_fill_ffill(ev, "user_id", "ts", "cents", step="1 hour")
    return filled.select(
        "user_id",
        F.unix_micros("grid_ts").alias("grid_us"),
        "cents",
    ).transform(ordered, "user_id", "grid_us")


# ---------------------------------------------------------------------------
# PageRank (iterative; engine-defined float iteration → rows-only check)


@register(
    "g_pagerank_suppliers",
    oracle=None,  # iterative power method: not SQL-expressible; t1 vs
    # numpy power iteration in tests/test_graph.py
    tags=("graph", "iterative"),
)
def g_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """PageRank over the part→supplier shipping graph (who supplies the
    parts that matter): top-20 nodes. Demonstrates the iterative-join
    pattern at its cheapest useful size; rank is rounded for output
    stability, the ordering key is (rounded rank desc, node) so the
    result set is deterministic."""
    from sparkflow_spark.graph import pagerank

    t = Tables(spark, sf)
    edges = t.lineitem.select(
        F.col("l_partkey").alias("src"), (F.col("l_suppkey") + 1_000_000).alias("dst")
    )
    pr = pagerank(edges, max_iter=8)
    return (
        pr.select("node", F.round("rank", 4).cast("double").alias("rank"))
        .orderBy(F.col("rank").desc(), "node")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# incremental aggregate maintenance


@register(
    "q63_incremental_rollup",
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS revenue_cents,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("pipeline", "agg"),
)
def q63_incremental_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental rollup maintenance: the 'history' partial (shipdate
    < 1999) and the 'delta' partial (>= 1999) are aggregated separately
    and MERGED via operators.merge_agg_states; the oracle recomputes
    from scratch — the hash match IS the merge-of-partials ==
    full-recompute proof on algebraic aggregates."""
    from sparkflow_spark.operators import merge_agg_states

    t = Tables(spark, sf)
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint")
    cutoff = F.lit("1999-01-01 00:00:00").cast("timestamp")

    def partial(df):
        return df.groupBy("l_returnflag").agg(
            F.sum(cents).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n"),
        )

    hist = partial(t.lineitem.filter(F.col("l_shipdate") < cutoff))
    delta = partial(t.lineitem.filter(F.col("l_shipdate") >= cutoff))
    merged = merge_agg_states([hist, delta], ["l_returnflag"], ["revenue_cents"], "n")
    return merged.select(
        "l_returnflag",
        F.col("revenue_cents").cast("bigint").alias("revenue_cents"),
        F.col("n").cast("bigint").alias("n"),
    ).transform(ordered, "l_returnflag")


# ---------------------------------------------------------------------------
# BM25 relevance scoring


_BM25_TERMS = ("hash", "join", "stream")
_BM25_K1 = 1.2
_BM25_B = 0.75


@register(
    "t_bm25_scores",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest(list_filter(
                       string_split_regex(lower(trim(text)), '\\s+'),
                       x -> x != '')) AS tok
            FROM documents),
        dl AS (SELECT doc_id, COUNT(*) AS doclen FROM toks GROUP BY doc_id),
        stats AS (SELECT COUNT(*) AS n, AVG(doclen) AS avgdl FROM dl),
        tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
               WHERE tok IN {_BM25_TERMS!r} GROUP BY doc_id, tok),
        dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok)
        SELECT tf.doc_id,
               CAST(ROUND(SUM(
                   ln((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                   * tf.tf * ({_BM25_K1} + 1.0)
                   / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                      + {_BM25_B} * dl.doclen / stats.avgdl))
               ), 3) AS DOUBLE) + 0.0 AS bm25
        FROM tf
        JOIN dl USING (doc_id)
        JOIN dfreq USING (tok), stats
        GROUP BY tf.doc_id
        ORDER BY tf.doc_id
    """,
    tags=("pipeline", "text", "agg"),
)
def t_bm25(spark: SparkSession, sf: str) -> DataFrame:
    """Okapi BM25 (Robertson-Spärck Jones idf, the Lucene '+1' smooth
    variant) of every document against a fixed 3-term query — the
    retrieval-quality sibling of TF-IDF, used to mine relevant training
    documents for a topic.

    Shape at 100 TB (round-6 single-scan rewrite — the previous
    toks→{doclen, tf} twin-agg form re-scanned documents 8× because
    Catalyst does not share subplans): ONE tokenize+explode pass feeds
    ONE per-doc aggregate carrying doclen AND the |terms| per-term tfs
    as conditional counts; that |docs|-row frame is materialized once
    and re-read by the 1-row corpus-stats aggregate (N, avgdl, per-term
    df) which broadcasts back onto it. Per-term score contributions sum
    in fixed term order (a zero tf contributes an exact 0.0). Only docs
    containing ≥1 query term appear — matching the oracle exactly."""
    t = Tables(spark, sf)
    terms = list(_BM25_TERMS)
    toks = t.documents.select("doc_id", F.explode(lower_tokens("text")).alias("tok"))
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("doclen"),
        *[
            F.count(F.when(F.col("tok") == term, 1)).alias(f"tf_{i}")
            for i, term in enumerate(terms)
        ],
    )
    per_doc = per_doc.localCheckpoint(eager=False)  # feeds stats AND scoring
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("doclen").alias("avgdl"),
        *[
            F.count(F.when(F.col(f"tf_{i}") > 0, 1)).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )

    def contrib(i: int):
        tf = F.col(f"tf_{i}")
        idf = F.log(
            (F.col("n") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5) + 1.0
        )
        tfn = (tf * (_BM25_K1 + 1.0)) / (
            tf + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("doclen") / F.col("avgdl"))
        )
        return F.when(tf > 0, idf * tfn).otherwise(F.lit(0.0))

    score = contrib(0)
    for i in range(1, len(terms)):
        score = score + contrib(i)
    any_term = sum(F.col(f"tf_{i}") for i in range(len(terms)))
    scored = (
        per_doc.join(F.broadcast(stats))
        .where(any_term > 0)
        .select("doc_id", F.round(score, 3).cast("double").alias("bm25"))
    )
    return scored.transform(ordered, "doc_id")


# ---------------------------------------------------------------------------
# market-basket frequent pairs


@register(
    "a_frequent_item_pairs",
    oracle="""
        WITH items AS (
            SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
            FROM lineitem),
        supports AS (SELECT item, COUNT(*) AS s FROM items GROUP BY item),
        pairs AS (
            SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS pair_count
            FROM items a JOIN items b
              ON a.basket = b.basket AND a.item < b.item
            GROUP BY 1, 2
            HAVING COUNT(*) >= 3)
        SELECT p.item_a, p.item_b, p.pair_count,
               sa.s AS count_a, sb.s AS count_b,
               CAST(ROUND(p.pair_count * 1.0 / sa.s, 3) AS DOUBLE) + 0.0
                 AS conf_a_b,
               CAST(ROUND(p.pair_count * 1.0 / sb.s, 3) AS DOUBLE) + 0.0
                 AS conf_b_a
        FROM pairs p
        JOIN supports sa ON sa.item = p.item_a
        JOIN supports sb ON sb.item = p.item_b
        ORDER BY item_a, item_b
    """,
    tags=("pipeline", "agg", "join"),
)
def a_frequent_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Market-basket mining over order baskets: part pairs co-ordered in
    ≥ 3 orders, with association confidence both directions. The Spark
    side expands pairs from bounded per-basket arrays (one HOF, work =
    Σ C(|basket|,2), ~7-item baskets); the oracle is the equivalent
    within-basket self-join — identical exact counts. max_basket=1000
    arms the quadratic-expansion guard without firing on the fixture."""
    t = Tables(spark, sf)
    out = frequent_item_pairs(
        t.lineitem.select(
            F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
        ),
        "basket",
        "item",
        min_support=3,
        max_basket=1000,
    )
    return out.select(
        "item_a",
        "item_b",
        "pair_count",
        "count_a",
        "count_b",
        F.round("conf_a_b", 3).cast("double").alias("conf_a_b"),
        F.round("conf_b_a", 3).cast("double").alias("conf_b_a"),
    ).transform(ordered, "item_a", "item_b")


# ---------------------------------------------------------------------------
# document chunking (fixed token windows with stride)


@register(
    "p_chunk_documents",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                               x -> x != '') AS toks
            FROM documents),
        t2 AS (SELECT doc_id, toks, len(toks) AS n FROM toks WHERE len(toks) > 0),
        c AS (SELECT doc_id, toks, n,
                     CASE WHEN n <= 64 THEN 1
                          ELSE 1 + CAST(ceil((n - 64) / 48.0) AS INT) END AS n_chunks
              FROM t2),
        e AS (SELECT doc_id, toks, n, CAST(u.i AS BIGINT) AS chunk_id
              FROM c, UNNEST(range(0, n_chunks)) AS u(i))
        SELECT doc_id, chunk_id,
               CAST(len(toks[chunk_id*48+1 : least(chunk_id*48+64, n)]) AS INT)
                 AS n_tokens,
               array_to_string(toks[chunk_id*48+1 : least(chunk_id*48+64, n)], ' ')
                 AS chunk_text
        FROM e
        ORDER BY doc_id, chunk_id
    """,
    tags=("pipeline", "text"),
)
def p_chunk_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Pre-training / RAG chunking: 64-token windows every 48 tokens
    (16-token overlap), ragged tail kept — operators.chunk_documents.
    Pure Catalyst (tokenize → sequence → explode → slice); fan-out is
    ~n/48 per doc, with no shuffle in the operator itself."""
    from sparkflow_spark.operators import chunk_documents

    t = Tables(spark, sf)
    out = chunk_documents(
        t.documents, text_col="text", id_col="doc_id", chunk_tokens=64, stride=48
    )
    return out.select(
        "doc_id", F.col("chunk_id").cast("bigint").alias("chunk_id"),
        "n_tokens", "chunk_text",
    ).transform(ordered, "doc_id", "chunk_id")


# ---------------------------------------------------------------------------
# snapshot reconciliation (table diff)


@register(
    "q64_table_diff",
    oracle="""
        WITH tgt AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
        src AS (
            SELECT c_custkey, c_name,
                   CASE WHEN c_custkey % 13 = 0
                        THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal
            FROM customer WHERE c_custkey % 97 <> 0
            UNION ALL
            SELECT c_custkey + 10000000, c_name, c_acctbal
            FROM customer WHERE c_custkey % 500 = 0),
        j AS (
            SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
                   CASE WHEN t.c_custkey IS NULL THEN 'added'
                        WHEN s.c_custkey IS NULL THEN 'removed'
                        WHEN (t.c_name IS DISTINCT FROM s.c_name)
                          OR (t.c_acctbal IS DISTINCT FROM s.c_acctbal)
                        THEN 'changed' END AS diff_kind,
                   t.c_name IS DISTINCT FROM s.c_name AS changed_c_name,
                   t.c_acctbal IS DISTINCT FROM s.c_acctbal AS changed_c_acctbal
            FROM tgt t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey)
        SELECT * FROM j WHERE diff_kind IS NOT NULL
        ORDER BY c_custkey
    """,
    tags=("pipeline", "join"),
)
def q64_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Snapshot reconciliation — operators.table_diff between the
    customer table and a synthetically-drifted successor (1/97 keys
    deleted, 1/13 balances bumped, 1/500 keys re-inserted under new
    ids). One key-partitioned full outer join; output rows ∝ drift,
    so the op stays cheap however big the table is."""
    from sparkflow_spark.operators import table_diff

    t = Tables(spark, sf)
    tgt = t.customer.select("c_custkey", "c_name", "c_acctbal")
    cust = t.customer
    src = cust.where(F.col("c_custkey") % 97 != 0).select(
        "c_custkey",
        "c_name",
        F.when(F.col("c_custkey") % 13 == 0, F.col("c_acctbal") + 100.0)
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    ).unionByName(
        cust.where(F.col("c_custkey") % 500 == 0).select(
            (F.col("c_custkey") + 10000000).alias("c_custkey"), "c_name", "c_acctbal"
        )
    )
    return table_diff(tgt, src, keys=["c_custkey"]).transform(ordered, "c_custkey")


# ---------------------------------------------------------------------------
# SCD type-2 dimension history from a change log


@register(
    "q65_scd2_history",
    oracle="""
        WITH marked AS (
            SELECT user_id, event_type, ts, event_id,
                   CASE WHEN lag(event_type) OVER w IS NOT DISTINCT FROM event_type
                             AND row_number() OVER w > 1
                        THEN 0 ELSE 1 END AS is_change
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        ch AS (SELECT * FROM marked WHERE is_change = 1)
        SELECT user_id, event_type,
               CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
               CAST(epoch_us(lead(ts) OVER w2) AS BIGINT) AS valid_to_us,
               lead(ts) OVER w2 IS NULL AS is_current
        FROM ch
        WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, valid_from_us, event_type
    """,
    tags=("pipeline", "window"),
)
def q65_scd2(spark: SparkSession, sf: str) -> DataFrame:
    """SCD type-2 dimension build — operators.scd2_from_changes over
    the events change log (attribute = event_type per user). Both
    windows share one (user_id) exchange; intervals are exact integer
    microseconds with event_id tiebreak, so the history is
    bit-identical cross-engine."""
    from sparkflow_spark.operators import scd2_from_changes

    t = Tables(spark, sf)
    out = scd2_from_changes(
        t.events, "user_id", "event_type", "ts", tiebreak_col="event_id"
    )
    return out.select(
        "user_id",
        "event_type",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        "is_current",
    ).transform(ordered, "user_id", "valid_from_us", "event_type")


# ---------------------------------------------------------------------------
# robust outlier detection (median absolute deviation)


@register(
    "q66_outlier_mad",
    oracle="""
        WITH med AS (
            SELECT event_type, quantile_cont(value, 0.5) AS m
            FROM events GROUP BY event_type),
        dev AS (
            SELECT e.event_type, e.value, med.m,
                   abs(e.value - med.m) AS adev
            FROM events e JOIN med USING (event_type)),
        mad AS (
            SELECT event_type, quantile_cont(adev, 0.5) AS mad
            FROM dev GROUP BY event_type)
        SELECT dev.event_type,
               COUNT(*) AS n_total,
               CAST(SUM(CASE WHEN dev.adev > 3 * 1.4826 * mad.mad
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               CAST(ROUND(MAX(mad.mad), 4) AS DOUBLE) + 0.0 AS mad
        FROM dev JOIN mad USING (event_type)
        GROUP BY dev.event_type
        ORDER BY dev.event_type
    """,
    tags=("pipeline", "agg"),
)
def q66_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Robust per-group outlier counts: |value − median| > 3·1.4826·MAD.
    Two grouped exact-percentile aggregations (tiny per-group results →
    broadcast back onto the fact), one fact scan kept by plan reuse.
    Both engines use continuous-interpolated medians (the X12 rule)."""
    t = Tables(spark, sf)
    ev = t.events.select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.percentile("value", 0.5).alias("m"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "value", F.abs(F.col("value") - F.col("m")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(F.percentile("adev", 0.5).alias("mad"))
    out = (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(
                F.when(F.col("adev") > 3 * 1.4826 * F.col("mad"), 1).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
            (F.round(F.max("mad"), 4).cast("double") + F.lit(0.0)).alias("mad"),
        )
    )
    return out.transform(ordered, "event_type")


# ---------------------------------------------------------------------------
# equi-width histogram


@register(
    "q67_histogram",
    oracle="""
        WITH b AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
                   FROM orders),
        binned AS (
            SELECT LEAST(CAST(FLOOR((o_totalprice - b.lo)
                                    / ((b.hi - b.lo) / 20.0)) AS INT), 19) AS bin
            FROM orders, b)
        SELECT bin, COUNT(*) AS n
        FROM binned GROUP BY bin ORDER BY bin
    """,
    tags=("pipeline", "agg"),
)
def q67_hist(spark: SparkSession, sf: str) -> DataFrame:
    """20-bin equi-width histogram of order totals. The (lo, hi) bounds
    ride a 1-row broadcast (scalar-subquery shape, q18's pattern); bin
    assignment is identical IEEE double arithmetic on both engines, so
    edge ties land in the same bin. One fact scan + one 20-row agg."""
    t = Tables(spark, sf)
    o = t.orders.select("o_totalprice")
    bounds = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    binned = o.join(F.broadcast(bounds)).select(
        F.least(
            F.floor(
                (F.col("o_totalprice") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / F.lit(20.0))
            ).cast("int"),
            F.lit(19),
        ).alias("bin")
    )
    return binned.groupBy("bin").agg(F.count(F.lit(1)).alias("n")).transform(ordered, "bin")


# ---------------------------------------------------------------------------
# triangle counting on the co-purchase graph


@register(
    "g_triangle_count",
    oracle="""
        WITH items AS (
            SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
            FROM lineitem),
        pairs AS (
            SELECT a.item AS a, b.item AS b
            FROM items a JOIN items b
              ON a.basket = b.basket AND a.item < b.item
            GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        tri AS (
            SELECT e1.a AS ta, e1.b AS tb, e2.b AS tc
            FROM pairs e1
            JOIN pairs e2 ON e2.a = e1.b
            JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b)
        SELECT node, COUNT(*) AS n_triangles FROM (
            SELECT UNNEST([ta, tb, tc]) AS node FROM tri) t
        GROUP BY node ORDER BY node
    """,
    tags=("pipeline", "graph"),
)
def g_triangles(spark: SparkSession, sf: str) -> DataFrame:
    """Per-node triangle counts on the co-purchase graph (parts
    co-ordered in ≥ 2 orders are edges) — graph.triangle_counts over
    the frequent_item_pairs edge list. Edges are oriented low→high id
    before the wedge join, the standard quadratic-wedge mitigation."""
    from sparkflow_spark.graph import triangle_counts

    t = Tables(spark, sf)
    edges = frequent_item_pairs(
        t.lineitem.select(
            F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
        ),
        "basket",
        "item",
        min_support=2,
        max_basket=1000,
    ).select("item_a", "item_b")
    return triangle_counts(edges, "item_a", "item_b").transform(ordered, "node")


# ---------------------------------------------------------------------------
# deterministic per-group sampling (t1 by design: engine-defined hash order)


@register(
    "q68_reservoir_per_group",
    oracle=None,  # selection is xxhash64-order — not expressible in the oracle;
    # exact-k/determinism invariants pinned in tests/test_pipeline_ops.py
    tags=("pipeline", "sampling"),
)
def q68_reservoir(spark: SparkSession, sf: str) -> DataFrame:
    """Exact 3-per-nation customer sample (hash-keyed reservoir
    equivalent) — operators.sample_k_per_group; deterministic under
    retries and cluster resizing, unlike rand()-keyed sampling."""
    from sparkflow_spark.operators import sample_k_per_group

    t = Tables(spark, sf)
    out = sample_k_per_group(
        t.customer.select("c_custkey", "c_nationkey"),
        "c_nationkey",
        3,
        key_cols=["c_custkey"],
        seed=42,
    )
    return out.transform(ordered, "c_nationkey", "c_custkey")


@register(
    "q69_weighted_sample",
    oracle=None,  # A-ES key order is engine-defined; weight-preference
    # + domain guards pinned in tests/test_pipeline_ops.py
    tags=("pipeline", "sampling"),
)
def q69_weighted(spark: SparkSession, sf: str) -> DataFrame:
    """Weight-proportional 5-per-segment customer sample
    (Efraimidis–Spirakis A-ES over account balance)."""
    from sparkflow_spark.operators import sample_k_per_group

    t = Tables(spark, sf)
    out = sample_k_per_group(
        t.customer.select("c_custkey", "c_mktsegment", "c_acctbal"),
        "c_mktsegment",
        5,
        key_cols=["c_custkey"],
        seed=42,
        weight_col="c_acctbal",
    )
    return out.select("c_custkey", "c_mktsegment").transform(
        ordered, "c_mktsegment", "c_custkey"
    )


# ---------------------------------------------------------------------------
# event funnel: view → click → purchase (strictly ordered stages)


@register(
    "q70_funnel_stages",
    oracle="""
        WITH v AS (
            SELECT user_id, MIN(ts) AS t_view FROM events
            WHERE event_type = 'view' GROUP BY user_id),
        c AS (
            SELECT e.user_id, MIN(e.ts) AS t_click
            FROM events e JOIN v USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > v.t_view
            GROUP BY e.user_id),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS t_purchase
            FROM events e JOIN c USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > c.t_click
            GROUP BY e.user_id)
        SELECT v.user_id,
               CAST(epoch_us(v.t_view) AS BIGINT) AS view_us,
               CAST(epoch_us(c.t_click) AS BIGINT) AS click_us,
               CAST(epoch_us(p.t_purchase) AS BIGINT) AS purchase_us
        FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        ORDER BY user_id
    """,
    tags=("pipeline", "window"),
)
def q70_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user conversion funnel with strict stage ordering: first
    view, first click AFTER that view, first purchase AFTER that click
    (NULL = stage not reached). Three aggregate-then-join stages, all
    hash-partitioned on user_id — Catalyst reuses the exchange, and at
    100 TB each stage input shrinks monotonically (funnel property), so
    the first agg dominates."""
    t = Tables(spark, sf)
    ev = t.events.select("user_id", "event_type", "ts")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.unix_micros("t_view").alias("view_us"),
            F.unix_micros("t_click").alias("click_us"),
            F.unix_micros("t_purchase").alias("purchase_us"),
        )
        .transform(ordered, "user_id")
    )


# ---------------------------------------------------------------------------
# cohort retention (weekly)


@register(
    "q71_cohort_retention",
    oracle="""
        WITH first AS (
            SELECT user_id,
                   CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
            FROM events GROUP BY user_id),
        act AS (
            SELECT DISTINCT e.user_id, f.cohort_week,
                   CAST(datediff('day', f.cohort_week,
                                 CAST(date_trunc('week', e.ts) AS DATE)) / 7
                        AS INT) AS week_offset
            FROM events e JOIN first f USING (user_id))
        SELECT cohort_week, week_offset, COUNT(*) AS n_active
        FROM act GROUP BY cohort_week, week_offset
        ORDER BY cohort_week, week_offset
    """,
    tags=("pipeline", "agg"),
)
def q71_cohort(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by the Monday-truncated
    week of their first event; n_active = distinct users of each cohort
    seen again N weeks later. First-event agg + broadcast-back join +
    distinct — the cohort table is |users| rows, tiny next to the event
    log it joins."""
    t = Tables(spark, sf)
    ev = t.events.select("user_id", "ts")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    act = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")).cast("date"),
                           F.col("cohort_week"))
                / 7
            ).cast("int").alias("week_offset"),
        )
        .distinct()
    )
    return (
        act.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .transform(ordered, "cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# user journey paths (ordered event sequences)


@register(
    "q73_journey_paths",
    oracle="""
        WITH s AS (
            SELECT user_id,
                   list(event_type ORDER BY ts, event_id) AS seq
            FROM events GROUP BY user_id)
        SELECT array_to_string(seq[1:5], '>') AS path,
               COUNT(*) AS n_users
        FROM s GROUP BY 1 ORDER BY path
    """,
    tags=("pipeline", "agg", "array"),
)
def q73_paths(spark: SparkSession, sf: str) -> DataFrame:
    """Path analysis: users grouped by their first five event types in
    time order. Spark's collect_list is unordered by contract, so the
    order rides the DATA — structs of (ts, event_id, type) sorted with
    array_sort after collection (one grouped agg, no window), then
    sliced and joined into the path label. Per-user arrays are bounded
    by history length; the second agg is on path labels (tiny)."""
    t = Tables(spark, sf)
    s = t.events.select(
        "user_id",
        F.struct(
            F.col("ts"), F.col("event_id"), F.col("event_type")
        ).alias("_e"),
    )
    seqs = s.groupBy("user_id").agg(
        F.array_sort(F.collect_list("_e")).alias("_seq")
    )
    path = F.concat_ws(
        ">", F.transform(F.slice("_seq", 1, 5), lambda x: x["event_type"])
    )
    return (
        seqs.select(path.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .transform(ordered, "path")
    )


# ---------------------------------------------------------------------------
# last-touch attribution with a conversion window


@register(
    "q75_attribution_daily",
    oracle="""
        WITH p AS (SELECT event_id, user_id, ts, value FROM events
                   WHERE event_type = 'purchase'),
        c AS (SELECT user_id, ts, ts AS click_ts FROM events
              WHERE event_type = 'click'),
        j AS (
            SELECT p.event_id, p.ts, p.value, c.click_ts
            FROM p ASOF LEFT JOIN c
              ON p.user_id = c.user_id AND p.ts >= c.ts)
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               COUNT(*) AS n_purchases,
               CAST(SUM(CASE WHEN click_ts IS NOT NULL
                             AND epoch_us(ts) - epoch_us(click_ts) <= 86400000000
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
               CAST(ROUND(SUM(CASE WHEN click_ts IS NOT NULL
                             AND epoch_us(ts) - epoch_us(click_ts) <= 86400000000
                             THEN value ELSE 0 END), 3) AS DOUBLE) + 0.0
                 AS attributed_value
        FROM j GROUP BY 1 ORDER BY day
    """,
    tags=("pipeline", "asof", "agg"),
)
def q75_attr(spark: SparkSession, sf: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent click at-or-before it, counted only inside a 24 h conversion
    window (exact integer-µs predicate), rolled up per purchase day —
    operators.asof_join (one user_id exchange) + one small agg. The
    attribution join never materializes candidate pairs: the as-of is a
    single window pass however dense the click stream is."""
    from sparkflow_spark.operators import asof_join

    t = Tables(spark, sf)
    p = t.events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    c = t.events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("ts").alias("click_ts")
    )
    j = asof_join(p, c, on="ts", by=["user_id"], value_cols=["click_ts"])
    within = F.col("click_ts_asof").isNotNull() & (
        F.unix_micros("ts") - F.unix_micros("click_ts_asof") <= 86_400_000_000
    )
    return (
        j.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.when(within, 1).otherwise(0)).cast("bigint").alias("n_attributed"),
            (
                F.round(F.sum(F.when(within, F.col("value")).otherwise(0.0)), 3)
                .cast("double") + F.lit(0.0)
            ).alias("attributed_value"),
        )
        .transform(ordered, "day")
    )


# ---------------------------------------------------------------------------
# deterministic hash split (cross-engine reproducible train/test)


@register(
    "q77_hash_split",
    oracle="""
        SELECT doc_id,
               CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8))::UBIGINT
                         / 4294967296.0 < 0.8
                    THEN 'train' ELSE 'test' END AS split
        FROM documents ORDER BY doc_id
    """,
    tags=("pipeline", "sampling"),
)
def q77_split(spark: SparkSession, sf: str) -> DataFrame:
    """80/20 train/test split by content hash — operators.hash_split.
    Fully oracle-checked: the DuckDB SQL re-derives the identical md5
    variate, proving the split is engine-independent (a row keeps its
    assignment across engines, retries, and corpus growth — no
    train/test leakage between pipeline versions)."""
    from sparkflow_spark.operators import hash_split

    t = Tables(spark, sf)
    return (
        hash_split(
            t.documents.select("doc_id"), "doc_id",
            {"train": 0.8, "test": 0.2}, seed=42,
        )
        .select("doc_id", "split")
        .transform(ordered, "doc_id")
    )


@register(
    "q78_md5_sample_per_group",
    oracle="""
        SELECT c_custkey, c_nationkey FROM (
            SELECT c_custkey, c_nationkey,
                   ROW_NUMBER() OVER (
                       PARTITION BY c_nationkey
                       ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS rn
            FROM customer) t
        WHERE rn <= 3 ORDER BY c_nationkey, c_custkey
    """,
    tags=("pipeline", "sampling"),
)
def q78_md5_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-3-per-nation sample ranked by md5 of the key — the
    cross-engine-checkable twin of q68's xxhash64 reservoir (md5 exists
    on both engines, xxhash64 only in Spark). Same single window-pass
    plan with map-side WindowGroupLimit pruning."""
    t = Tables(spark, sf)
    w = Window.partitionBy("c_nationkey").orderBy(
        F.md5(F.col("c_custkey").cast("string")), "c_custkey"
    )
    return (
        t.customer.select("c_custkey", "c_nationkey")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("c_custkey", "c_nationkey")
        .transform(ordered, "c_nationkey", "c_custkey")
    )


# ---------------------------------------------------------------------------
# order-independent table checksums (replication validation)


@register(
    "q79_table_checksums",
    oracle="""
        SELECT 'customer' AS tbl, COUNT(*) AS n_rows,
               CAST(SUM(('0x' || substr(md5(
                   (CASE WHEN c_custkey IS NULL THEN 'N'
                         ELSE length(CAST(c_custkey AS VARCHAR)) || ':'
                              || CAST(c_custkey AS VARCHAR) END) || '|' ||
                   (CASE WHEN c_name IS NULL THEN 'N'
                         ELSE length(c_name) || ':' || c_name END) || '|' ||
                   (CASE WHEN c_mktsegment IS NULL THEN 'N'
                         ELSE length(c_mktsegment) || ':' || c_mktsegment END)
                   ), 1, 8))::UBIGINT::HUGEINT)
                   AS VARCHAR) AS checksum
        FROM customer
        UNION ALL
        SELECT 'orders', COUNT(*),
               CAST(SUM(('0x' || substr(md5(
                   (CASE WHEN o_orderkey IS NULL THEN 'N'
                         ELSE length(CAST(o_orderkey AS VARCHAR)) || ':'
                              || CAST(o_orderkey AS VARCHAR) END) || '|' ||
                   (CASE WHEN o_custkey IS NULL THEN 'N'
                         ELSE length(CAST(o_custkey AS VARCHAR)) || ':'
                              || CAST(o_custkey AS VARCHAR) END) || '|' ||
                   (CASE WHEN o_orderstatus IS NULL THEN 'N'
                         ELSE length(o_orderstatus) || ':' || o_orderstatus END)
                   ), 1, 8))::UBIGINT::HUGEINT)
                   AS VARCHAR)
        FROM orders
        ORDER BY tbl
    """,
    tags=("pipeline", "integrity"),
)
def q79_checksums(spark: SparkSession, sf: str) -> DataFrame:
    """Content checksums of two tables in one result — the replication
    validation pattern (compare scalars, not tables). Each is one scan
    with map-side partial SUM; the checksum value is compared as a
    string so DECIMAL(38) vs HUGEINT render identically."""
    from sparkflow_spark.operators import table_checksum

    t = Tables(spark, sf)
    c = table_checksum(
        t.customer, ["c_custkey", "c_name", "c_mktsegment"]
    ).select(
        F.lit("customer").alias("tbl"), "n_rows",
        F.col("checksum").cast("string").alias("checksum"),
    )
    o = table_checksum(
        t.orders, ["o_orderkey", "o_custkey", "o_orderstatus"]
    ).select(
        F.lit("orders").alias("tbl"), "n_rows",
        F.col("checksum").cast("string").alias("checksum"),
    )
    return c.unionByName(o).transform(ordered, "tbl")


# ---------------------------------------------------------------------------
# multi-touch attribution (interval join, credit conserved)


@register(
    "q80_multitouch_attribution",
    oracle="""
        WITH p AS (SELECT event_id AS pid, user_id, ts, value FROM events
                   WHERE event_type = 'purchase'),
        c AS (SELECT event_id AS cid, user_id, ts AS cts FROM events
              WHERE event_type = 'click'),
        touches AS (
            SELECT p.pid, p.value, c.cid, c.cts
            FROM p JOIN c
              ON p.user_id = c.user_id
             AND c.cts <= p.ts
             AND epoch_us(p.ts) - epoch_us(c.cts) < 86400000000),
        credit AS (
            SELECT cid, cts,
                   CAST(FLOOR(value * 1000000 / COUNT(*) OVER (PARTITION BY pid))
                        AS BIGINT) AS share_micro
            FROM touches)
        SELECT CAST(date_trunc('day', cts) AS DATE) AS day,
               COUNT(*) AS n_touches,
               CAST(SUM(share_micro) AS BIGINT) AS credited_micro
        FROM credit GROUP BY 1 ORDER BY day
    """,
    tags=("pipeline", "join", "window"),
)
def q80_multitouch(spark: SparkSession, sf: str) -> DataFrame:
    """Linear multi-touch attribution: every click in the 24 h before a
    purchase shares that purchase's value equally; credit is aggregated
    to the CLICK day (the marketing-spend view; credit is conserved up
    to integer truncation). Shares are EXACT integer micro-units — the
    double value*1e6/n is computed identically on both engines, floor
    makes it discrete, and the BIGINT sum is order-independent (a float
    SUM of shares diverged by 1 ulp at the sf0.1 rounding boundary; the
    integer form is the scale-safe contract). The interval join keeps
    user_id as the equi key with the time window as a residual
    predicate, so it shuffles once on user and never builds a
    cartesian; the share division is one purchase-keyed window."""
    t = Tables(spark, sf)
    ev = t.events
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", "ts", "value"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), "user_id", F.col("ts").alias("cts")
    )
    touches = p.join(c, "user_id").where(
        (F.col("cts") <= F.col("ts"))
        & (F.unix_micros("ts") - F.unix_micros("cts") < 86_400_000_000)
    )
    w = Window.partitionBy("pid")
    credit = touches.select(
        "cid",
        "cts",
        F.floor(F.col("value") * 1000000 / F.count(F.lit(1)).over(w))
        .cast("bigint")
        .alias("share_micro"),
    )
    return (
        credit.groupBy(F.date_trunc("day", "cts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum("share_micro").alias("credited_micro"),
        )
        .transform(ordered, "day")
    )


# ---------------------------------------------------------------------------
# privacy: k-anonymity audit + DP noisy counts


@register(
    "q85_k_anonymity_audit",
    oracle="""
        SELECT c_nationkey, c_mktsegment, COUNT(*) AS group_size
        FROM customer
        GROUP BY c_nationkey, c_mktsegment
        HAVING COUNT(*) < 25
        ORDER BY c_nationkey, c_mktsegment
    """,
    tags=("pipeline", "privacy", "agg"),
)
def q85_kanon(spark: SparkSession, sf: str) -> DataFrame:
    """k-anonymity audit over the (nation, segment) quasi-identifier
    pair: equivalence classes smaller than k=25 — the re-identifiable
    groups a release pipeline must suppress or generalize. One grouped
    count with map-side partials; output ∝ violations, not data."""
    t = Tables(spark, sf)
    return (
        t.customer.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .where(F.col("group_size") < 25)
        .transform(ordered, "c_nationkey", "c_mktsegment")
    )


@register(
    "q86_dp_noisy_counts",
    oracle="""
        WITH c AS (
            SELECT c_nationkey, COUNT(*) AS true_count FROM customer
            GROUP BY c_nationkey),
        u AS (
            SELECT c_nationkey, true_count,
                   ('0x' || substr(md5(CAST(c_nationkey AS VARCHAR) || ':dp42'), 1, 8))::UBIGINT
                     / 4294967296.0 AS u
            FROM c)
        SELECT c_nationkey,
               CAST(ROUND(true_count
                    + CASE WHEN u < 0.5 THEN 2.0 * ln(2.0 * u)
                           ELSE -2.0 * ln(2.0 * (1.0 - u)) END, 4) AS DOUBLE) + 0.0
                 AS noisy_count
        FROM u ORDER BY c_nationkey
    """,
    tags=("pipeline", "privacy", "agg"),
)
def q86_dp(spark: SparkSession, sf: str) -> DataFrame:
    """Differentially-private noisy counts (Laplace mechanism,
    sensitivity 1, ε=0.5 → scale b=2): noise = inverse-CDF of a
    uniform variate. The variate is the md5-derived u (the q77
    cross-engine trick) so BOTH engines produce bit-identical noise —
    the testing mode for a DP release pipeline; production swaps the
    hash for a real RNG and keeps everything else. No per-row data
    leaves the aggregate: noise attaches to the 1-row-per-group
    result."""
    from sparkflow_spark.operators import md5_uniform

    t = Tables(spark, sf)
    c = t.customer.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("true_count"))
    u = md5_uniform(F.col("c_nationkey"), ":dp42")
    noise = F.when(u < 0.5, 2.0 * F.log(2.0 * u)).otherwise(
        -2.0 * F.log(2.0 * (1.0 - u))
    )
    return c.select(
        "c_nationkey",
        (F.round(F.col("true_count") + noise, 4).cast("double") + F.lit(0.0)).alias(
            "noisy_count"
        ),
    ).transform(ordered, "c_nationkey")


# ---------------------------------------------------------------------------
# A/B experiment readout (hash assignment + two-proportion z)


@register(
    "q87_ab_test_readout",
    oracle="""
        WITH assign AS (
            SELECT DISTINCT user_id,
                   CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':ab1'), 1, 8))::UBIGINT
                             / 4294967296.0 < 0.5
                        THEN 'control' ELSE 'treatment' END AS variant
            FROM events),
        conv AS (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
        per_variant AS (
            SELECT a.variant,
                   COUNT(*) AS n_users,
                   CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_converted
            FROM assign a LEFT JOIN conv c USING (user_id)
            GROUP BY a.variant)
        SELECT variant, n_users, n_converted,
               CAST(ROUND(n_converted * 1.0 / n_users, 6) AS DOUBLE) + 0.0
                 AS conversion
        FROM per_variant ORDER BY variant
    """,
    tags=("pipeline", "experiment", "agg"),
)
def q87_ab(spark: SparkSession, sf: str) -> DataFrame:
    """A/B experiment readout: users assigned to variants by the
    engine-independent md5 hash (operators.hash_split's variate — the
    assignment survives re-runs and engine swaps, the property that
    makes an experiment auditable), conversion = any purchase. Counts
    are integers, the conversion rate one division — bit-stable. The
    z-statistic lives client-side on these four numbers; the engine's
    job is the deterministic assignment + exact counts."""
    from sparkflow_spark.operators import md5_uniform

    t = Tables(spark, sf)
    users = t.events.select("user_id").distinct()
    u = md5_uniform(F.col("user_id"), ":ab1")
    assign = users.select(
        "user_id",
        F.when(u < 0.5, F.lit("control")).otherwise(F.lit("treatment")).alias("variant"),
    )
    conv = (
        t.events.where(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("_converted", F.lit(1))
    )
    return (
        assign.join(conv, "user_id", "left")
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.coalesce(F.col("_converted"), F.lit(0))).cast("bigint").alias("n_converted"),
        )
        .select(
            "variant",
            "n_users",
            "n_converted",
            (
                F.round(F.col("n_converted") / F.col("n_users"), 6).cast("double")
                + F.lit(0.0)
            ).alias("conversion"),
        )
        .transform(ordered, "variant")
    )


# ---------------------------------------------------------------------------
# sessionized conversion (view → purchase inside one session)


@register(
    "q88_session_conversion",
    oracle="""
        WITH marked AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                > 21600000000
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sid AS (
            SELECT user_id, ts, event_type,
                   SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_id
            FROM marked),
        v AS (
            SELECT user_id, session_id,
                   MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view
            FROM sid GROUP BY user_id, session_id),
        s AS (
            SELECT v.user_id, v.session_id,
                   v.first_view IS NOT NULL AS has_view,
                   MAX(CASE WHEN sid.event_type = 'purchase'
                                 AND v.first_view IS NOT NULL
                                 AND sid.ts > v.first_view
                            THEN 1 ELSE 0 END) AS converted
            FROM v JOIN sid USING (user_id, session_id)
            GROUP BY v.user_id, v.session_id, v.first_view)
        SELECT COUNT(*) AS n_sessions,
               CAST(SUM(CASE WHEN has_view THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_with_view,
               CAST(SUM(converted) AS BIGINT) AS n_converted
        FROM s
    """,
    tags=("pipeline", "window", "session"),
)
def q88_sess_conv(spark: SparkSession, sf: str) -> DataFrame:
    """Sessionized conversion: of all 6-hour-gap sessions, how many
    contain a view, and how many convert (a purchase strictly after the
    session's first view). Three window/agg stages all on ONE user_id
    partitioning (session ids, first-view, conversion flag); the
    session split is exact integer microseconds, counts are integers —
    bit-stable cross-engine."""
    t = Tables(spark, sf)
    ev = t.events.select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    marked = ev.withColumn(
        "is_new",
        F.when(F.lag("ts").over(w).isNull() | (gap_us > 21_600_000_000), 1).otherwise(0),
    )
    sid = marked.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    w2 = Window.partitionBy("user_id", "session_id")
    with_v = sid.withColumn(
        "first_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w2),
    )
    per_session = (
        with_v.groupBy("user_id", "session_id", "first_view")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & F.col("first_view").isNotNull()
                    & (F.col("ts") > F.col("first_view")),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
    )
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("first_view").isNotNull(), 1).otherwise(0))
        .cast("bigint").alias("n_with_view"),
        F.sum("converted").cast("bigint").alias("n_converted"),
    )


# ---------------------------------------------------------------------------
# DAU / WAU / stickiness (rolling exact distinct users)


@register(
    "q89_active_users",
    oracle="""
        WITH du AS (
            SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
            FROM events),
        days AS (SELECT DISTINCT day FROM du),
        wau AS (
            SELECT d.day, COUNT(DISTINCT du.user_id) AS wau7
            FROM days d JOIN du
              ON du.day BETWEEN d.day - 6 AND d.day
            GROUP BY d.day),
        dau AS (SELECT day, COUNT(*) AS dau FROM du GROUP BY day)
        SELECT dau.day, dau.dau, wau.wau7,
               CAST(ROUND(dau.dau * 1.0 / wau.wau7, 4) AS DOUBLE) + 0.0
                 AS stickiness
        FROM dau JOIN wau USING (day)
        ORDER BY day
    """,
    tags=("pipeline", "agg", "window"),
)
def q89_active(spark: SparkSession, sf: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day — EXACT rolling
    distinct (sliding distinct is not frame-aggregatable, and sketches
    change the answer): each (day, user) pair fans out to the ≤7 window
    days it supports, then one distinct count per window day. Fan-out
    is a constant 7 — linear, shuffle-keyed on the window day; at
    100 TB the (day, user) dedup is the only user-cardinality stage.
    Stickiness is one division of exact integers."""
    t = Tables(spark, sf)
    du = (
        t.events.select(
            F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
        )
        .distinct()
    )
    # du feeds THREE consumers (dau, the fan-out, the day list) and
    # Catalyst does not share subplans — without materialization the
    # events table is scanned once per consumer (round-6 plan audit: 6
    # scans / 9 exchanges). The distinct (day, user) set is the small
    # user-cardinality reduction of the log; materialize it once.
    du = du.localCheckpoint(eager=False)
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    expanded = du.select(
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias("wday"),
        "user_id",
    )
    days = du.select(F.col("day")).distinct()
    wau = (
        expanded.join(days, expanded["wday"] == days["day"])
        .select("day", "user_id")
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("wau7"))
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau7",
            (F.round(F.col("dau") / F.col("wau7"), 4).cast("double") + F.lit(0.0)).alias(
                "stickiness"
            ),
        )
        .transform(ordered, "day")
    )


@register(
    "g_label_prop_communities",
    oracle=None,  # iterative fixpoint labels are engine-defined;
    # synchronous-rule parity vs a python reference + determinism pinned
    # in tests/test_graph.py
    tags=("pipeline", "graph"),
)
def g_lpa(spark: SparkSession, sf: str) -> DataFrame:
    """Community detection on the co-purchase graph (min_support=2
    edges) — graph.label_propagation; returns community sizes (a stable
    small summary of an engine-defined fixpoint)."""
    from sparkflow_spark.graph import label_propagation

    edges = frequent_item_pairs(
        Tables(spark, sf).lineitem.select(
            F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
        ),
        "basket",
        "item",
        min_support=2,
        max_basket=1000,
    ).select("item_a", "item_b")
    labels = label_propagation(edges, "item_a", "item_b", max_iter=5)
    return (
        labels.groupBy("community")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .transform(ordered, "community")
    )


@register(
    "q91_weighted_sample_md5",
    oracle="""
        WITH u AS (
            SELECT c_custkey, c_mktsegment, c_acctbal,
                   ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':aes7'), 1, 8))::UBIGINT
                     / 4294967296.0 AS u
            FROM customer WHERE c_acctbal > 0),
        ranked AS (
            SELECT c_custkey, c_mktsegment,
                   ROW_NUMBER() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY -ln(u) / c_acctbal, c_custkey) AS rn
            FROM u)
        SELECT c_custkey, c_mktsegment FROM ranked
        WHERE rn <= 5 ORDER BY c_mktsegment, c_custkey
    """,
    tags=("pipeline", "sampling"),
)
def q91_weighted_md5(spark: SparkSession, sf: str) -> DataFrame:
    """Weight-proportional (Efraimidis–Spirakis A-ES) 5-per-segment
    sample, fully ORACLE-CHECKED: the rank key -ln(u)/w uses the
    md5_uniform variate, so DuckDB re-derives the identical exponential
    keys and the selection hash-matches — upgrading weighted sampling
    from the t1-only xxhash64 variant (q69). Same one-window-pass plan
    with map-side WindowGroupLimit pruning."""
    from sparkflow_spark.operators import md5_uniform

    t = Tables(spark, sf)
    src = t.customer.where(F.col("c_acctbal") > 0)
    u = md5_uniform(F.col("c_custkey"), ":aes7")
    w = Window.partitionBy("c_mktsegment").orderBy(
        (-F.log(u) / F.col("c_acctbal")).asc(), F.col("c_custkey")
    )
    return (
        src.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("c_custkey", "c_mktsegment")
        .transform(ordered, "c_mktsegment", "c_custkey")
    )


# ---------------------------------------------------------------------------
# event-type transition matrix (first-order Markov behavior model)


@register(
    "q92_event_transitions",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
            FROM events),
        pairs AS (
            SELECT prev_type, event_type AS next_type, COUNT(*) AS n
            FROM seq WHERE prev_type IS NOT NULL
            GROUP BY prev_type, next_type),
        tot AS (
            SELECT prev_type, SUM(n) AS row_n FROM pairs GROUP BY prev_type)
        SELECT p.prev_type, p.next_type, p.n,
               CAST(ROUND(p.n * 1.0 / t.row_n, 6) AS DOUBLE) + 0.0 AS prob
        FROM pairs p JOIN tot t USING (prev_type)
        ORDER BY prev_type, next_type
    """,
    tags=("pipeline", "window", "agg"),
)
def q92_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: counts
    and row-normalized probabilities of event-type B following A in a
    user's timeline (event_id tiebreak = total order). One user_id
    window + one small agg; probabilities are single divisions of
    exact integer counts — bit-stable. The output is |types|² rows
    regardless of corpus size."""
    t = Tables(spark, sf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t.events.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    pairs = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    # r13: row totals as a partition window over the tiny |types|² pairs
    # frame instead of a groupBy + join back — the self-derived `tot`
    # join re-executed the whole scan→shuffle→window→agg subtree for its
    # other leg (plan: 2 scans + 2 Windows → 1; guide §2.4). Same exact
    # integer sum, so round(n/row_n, 6) is bit-identical.
    row_n = F.sum("n").over(Window.partitionBy("prev_type"))
    return (
        pairs.select(
            "prev_type",
            "next_type",
            "n",
            (F.round(F.col("n") / row_n, 6).cast("double") + F.lit(0.0)).alias(
                "prob"
            ),
        )
        .transform(ordered, "prev_type", "next_type")
    )


# ---------------------------------------------------------------------------
# spend concentration (Gini coefficient per segment)


@register(
    "q93_spend_gini",
    oracle="""
        WITH spend AS (
            SELECT c.c_mktsegment, o.o_custkey,
                   CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                     AS cents
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY c.c_mktsegment, o.o_custkey),
        ranked AS (
            SELECT c_mktsegment, cents,
                   ROW_NUMBER() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY cents, o_custkey) AS i
            FROM spend),
        agg AS (
            SELECT c_mktsegment,
                   COUNT(*) AS n,
                   CAST(SUM(cents) AS BIGINT) AS s,
                   CAST(SUM(i * cents) AS BIGINT) AS sw
            FROM ranked GROUP BY c_mktsegment)
        SELECT c_mktsegment, n,
               CAST(ROUND(2.0 * sw / (n * CAST(s AS DOUBLE))
                          - (n + 1.0) / n, 6) AS DOUBLE) + 0.0 AS gini
        FROM agg ORDER BY c_mktsegment
    """,
    tags=("pipeline", "agg", "window"),
)
def q93_gini(spark: SparkSession, sf: str) -> DataFrame:
    """Gini coefficient of customer spend per market segment — the
    inequality/concentration metric (0 = uniform, →1 = concentrated).
    Spend in exact integer cents, rank-weighted sums as exact BIGINTs
    (Σi·xᵢ), so the only float ops are the two final divisions — the
    same closed-form both engines evaluate identically. Per-segment
    window after per-customer reduction (the q81 cardinality
    argument)."""
    t = Tables(spark, sf)
    spend = (
        t.orders.join(t.customer, t.orders["o_custkey"] == t.customer["c_custkey"])
        .groupBy("c_mktsegment", "o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint").alias("cents")
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy("cents", "o_custkey")
    ranked = spend.withColumn("i", F.row_number().over(w))
    agg = ranked.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
        F.sum(F.col("i") * F.col("cents")).cast("bigint").alias("sw"),
    )
    gini = (
        2.0 * F.col("sw") / (F.col("n") * F.col("s").cast("double"))
        - (F.col("n") + 1.0) / F.col("n")
    )
    return agg.select(
        "c_mktsegment",
        "n",
        (F.round(gini, 6).cast("double") + F.lit(0.0)).alias("gini"),
    ).transform(ordered, "c_mktsegment")


# ---------------------------------------------------------------------------
# signup-anchored day-N retention curve


@register(
    "q94_retention_curve",
    oracle="""
        WITH signup AS (
            SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS d0
            FROM events WHERE event_type = 'signup' GROUP BY user_id),
        act AS (
            SELECT DISTINCT e.user_id,
                   datediff('day', s.d0, CAST(date_trunc('day', e.ts) AS DATE))
                     AS day_n
            FROM events e JOIN signup s USING (user_id)),
        base AS (SELECT COUNT(*) AS n0 FROM signup)
        SELECT act.day_n,
               COUNT(*) AS n_active,
               CAST(ROUND(COUNT(*) * 1.0 / base.n0, 6) AS DOUBLE) + 0.0
                 AS retention
        FROM act, base
        WHERE act.day_n BETWEEN 0 AND 14
        GROUP BY act.day_n, base.n0
        ORDER BY act.day_n
    """,
    tags=("pipeline", "agg"),
)
def q94_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Signup-anchored retention curve: of users with a signup event,
    the fraction active N days after their first signup (N = 0..14).
    The anchor table is |users| rows riding a broadcast-eligible join
    back onto the event log; day offsets are integer date arithmetic
    and retention one division of exact counts."""
    t = Tables(spark, sf)
    ev = t.events
    signup = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.date_trunc("day", "ts").cast("date")).alias("d0"))
    )
    act = (
        ev.join(signup, "user_id")
        .select(
            "user_id",
            F.datediff(F.date_trunc("day", "ts").cast("date"), F.col("d0")).alias(
                "day_n"
            ),
        )
        .distinct()
    )
    n0 = signup.agg(F.count(F.lit(1)).alias("n0"))
    return (
        act.where(F.col("day_n").between(0, 14))
        .groupBy("day_n")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(F.broadcast(n0))
        .select(
            "day_n",
            "n_active",
            (F.round(F.col("n_active") / F.col("n0"), 6).cast("double") + F.lit(0.0)).alias(
                "retention"
            ),
        )
        .transform(ordered, "day_n")
    )


# ---------------------------------------------------------------------------
# order fulfillment lead time


@register(
    "q95_fulfillment_leadtime",
    oracle="""
        WITH ship AS (
            SELECT l_orderkey,
                   MAX(CAST(date_trunc('day', l_shipdate) AS DATE)) AS last_ship
            FROM lineitem GROUP BY l_orderkey),
        lead AS (
            SELECT o.o_orderpriority,
                   datediff('day', CAST(date_trunc('day', o.o_orderdate) AS DATE),
                            s.last_ship) AS lead_days
            FROM orders o JOIN ship s ON s.l_orderkey = o.o_orderkey)
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(ROUND(quantile_cont(lead_days, 0.5), 1) AS DOUBLE) + 0.0
                 AS median_days,
               CAST(ROUND(quantile_cont(lead_days, 0.95), 1) AS DOUBLE) + 0.0
                 AS p95_days,
               CAST(MAX(lead_days) AS BIGINT) AS max_days
        FROM lead GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("pipeline", "agg", "percentile"),
)
def q95_leadtime(spark: SparkSession, sf: str) -> DataFrame:
    """Fulfillment lead time per order priority: days from order date
    to the LAST line shipment (the customer-visible completion),
    summarized with exact percentiles over integer day diffs — the
    operations-SLA readout. One per-order max + one keyed join + one
    grouped ordered-set agg."""
    t = Tables(spark, sf)
    ship = t.lineitem.groupBy("l_orderkey").agg(
        F.max(F.date_trunc("day", "l_shipdate").cast("date")).alias("last_ship")
    )
    lead = t.orders.join(
        ship, t.orders["o_orderkey"] == ship["l_orderkey"]
    ).select(
        "o_orderpriority",
        F.datediff(
            F.col("last_ship"), F.date_trunc("day", "o_orderdate").cast("date")
        ).alias("lead_days"),
    )
    return (
        lead.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.round(F.percentile("lead_days", 0.5), 1).cast("double") + F.lit(0.0)).alias(
                "median_days"
            ),
            (F.round(F.percentile("lead_days", 0.95), 1).cast("double") + F.lit(0.0)).alias(
                "p95_days"
            ),
            F.max("lead_days").cast("bigint").alias("max_days"),
        )
        .transform(ordered, "o_orderpriority")
    )


@register(
    "d_event_debounce",
    oracle="""
        WITH g AS (
            SELECT event_type,
                   epoch_us(ts) - epoch_us(lag(ts) OVER
                       (PARTITION BY user_id, event_type
                        ORDER BY ts, event_id)) AS gap_us
            FROM events)
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us >= 600000000
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN gap_us < 600000000
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_suppressed
        FROM g GROUP BY event_type ORDER BY event_type
    """,
    tags=("dedup", "window", "events"),
)
def d_event_debounce(spark: SparkSession, sf: str) -> DataFrame:
    """Telemetry debounce: a repeat of the same (user, event_type)
    within 10 minutes of the PREVIOUS raw occurrence is a duplicate
    fire (retry storms, double-clicks, at-least-once producers) and is
    suppressed; the first of each burst survives. The consecutive-gap
    rule is a single lag() over one (user_id, event_type) exchange —
    exactly the sessionize shuffle shape, linear at any scale (contrast
    TTL-against-last-KEPT, which is an iterative chain — this is the
    form production event pipelines actually deploy for idempotency).
    Integer-µs arithmetic; reports kept/suppressed per event type."""
    t = Tables(spark, sf)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    g = t.events.select(
        "event_type",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    )
    ttl = 600_000_000  # 10 min in µs
    return (
        g.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(
                F.when(F.col("gap_us").isNull() | (F.col("gap_us") >= ttl), 1).otherwise(0)
            ).cast("bigint").alias("n_kept"),
            F.sum(F.when(F.col("gap_us") < ttl, 1).otherwise(0)).cast("bigint").alias("n_suppressed"),
        )
        .transform(ordered, "event_type")
    )


@register(
    "a_heavy_hitters_mg",
    oracle="""
        SELECT event_type, CAST(cnt AS BIGINT) AS cnt FROM (
            SELECT event_type, COUNT(*) AS cnt,
                   SUM(COUNT(*)) OVER () AS total
            FROM events GROUP BY event_type) t
        WHERE cnt * 10 > total ORDER BY event_type
    """,
    tags=("sketch", "skew"),
)
def a_heavy_hitters_mg(spark: SparkSession, sf: str) -> DataFrame:
    """Exact heavy hitters (count > n/10) via the two-pass Misra-Gries
    sketch: pass 1 keeps ≤ 9 counters per partition (candidate memory
    is independent of key cardinality — the property that matters at
    billions of keys, where the plain groupBy's one-row-per-key state
    IS the bottleneck); pass 2 exactly recounts candidates only. The
    sketch bounds memory but never decides membership, so the result
    equals a plain GROUP BY ... HAVING count > n/k in any engine."""
    from sparkflow_spark.operators import heavy_hitters

    t = Tables(spark, sf)
    return (
        heavy_hitters(t.events, "event_type", k=10)
        .select("event_type", F.col("cnt").cast("bigint").alias("cnt"))
        .transform(ordered, "event_type")
    )


_DQ_RULES = (
    ("null_key", "l_orderkey IS NULL OR l_partkey IS NULL OR l_suppkey IS NULL"),
    ("qty_out_of_range", "l_quantity <= 0 OR l_quantity > 50"),
    ("discount_out_of_range", "l_discount < 0 OR l_discount > 0.1"),
    ("tax_negative", "l_tax < 0"),
    ("returnflag_not_in_enum", "l_returnflag NOT IN ('A', 'N', 'R')"),
    ("price_nonpositive", "l_extendedprice <= 0"),
    ("shipdate_stale_pre_1996", "l_shipdate < TIMESTAMP '1996-01-01 00:00:00'"),
)


@register(
    "q103_dq_audit",
    oracle=f"""
        WITH a AS (
            SELECT COUNT(*) AS n,
                   {", ".join(f"SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS v{i}" for i, (_, cond) in enumerate(_DQ_RULES))}
            FROM lineitem)
        {" UNION ALL ".join(
            f"SELECT '{name}' AS rule, CAST(v{i} AS BIGINT) AS n_violations, "
            f"CAST(ROUND(v{i} * 1.0 / n, 6) AS DOUBLE) + 0.0 AS viol_rate FROM a"
            for i, (name, _) in enumerate(_DQ_RULES))}
        ORDER BY rule
    """,
    tags=("pipeline", "quality"),
)
def q103_dq_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Data-quality expectation audit: seven production-style rules
    (null keys, range bands, enum membership, sign checks, freshness)
    evaluated in ONE scan — all counters are sum(CASE) aggregates of
    the same pass, so adding a rule costs an expression, not a job
    (same single-scan discipline as the column profiler; contrast a
    naive one-query-per-rule harness that rescans 100 TB per rule).
    The freshness rule genuinely fires on the fixtures, so the hash
    check covers nonzero counts, not just zeros. Complements
    assert_schema (plan-time contract) with data-level contracts."""
    t = Tables(spark, sf)
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.when(F.expr(cond), 1).otherwise(0)).alias(f"v{i}")
        for i, (_, cond) in enumerate(_DQ_RULES)
    ]
    one = t.lineitem.agg(*aggs)
    pairs = ", ".join(f"'{name}', v{i}" for i, (name, _) in enumerate(_DQ_RULES))
    return (
        one.select(
            "n", F.expr(f"stack({len(_DQ_RULES)}, {pairs}) AS (rule, n_violations)")
        )
        .select(
            "rule",
            F.col("n_violations").cast("bigint").alias("n_violations"),
            (F.round(F.col("n_violations") * F.lit(1.0) / F.col("n"), 6).cast("double") + F.lit(0.0)).alias("viol_rate"),
        )
        .transform(ordered, "rule")
    )


@register(
    "g_link_prediction",
    oracle="""
        WITH items AS (
            SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
            FROM lineitem),
        edges AS (
            SELECT a.item AS a, b.item AS b
            FROM items a JOIN items b
              ON a.basket = b.basket AND a.item < b.item
            GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        adj AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges),
        deg AS (SELECT a AS node, COUNT(*) AS deg FROM adj GROUP BY a),
        half AS (
            SELECT adj.b AS z, adj.a AS node FROM adj
            JOIN deg ON deg.node = adj.b
            WHERE deg.deg <= 50),
        common AS (
            SELECT w1.node AS node_a, w2.node AS node_b,
                   COUNT(*) AS common
            FROM half w1 JOIN half w2
              ON w1.z = w2.z AND w1.node < w2.node
            GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        cand AS (
            SELECT c.* FROM common c
            LEFT JOIN edges e ON e.a = c.node_a AND e.b = c.node_b
            WHERE e.a IS NULL)
        SELECT node_a, node_b,
               CAST(common AS BIGINT) AS common,
               CAST(da.deg AS BIGINT) AS degree_a,
               CAST(db.deg AS BIGINT) AS degree_b,
               CAST(ROUND(common * 1.0 / (da.deg + db.deg - common), 6)
                    AS DOUBLE) + 0.0 AS jaccard
        FROM cand
        JOIN deg da ON da.node = cand.node_a
        JOIN deg db ON db.node = cand.node_b
        ORDER BY node_a, node_b
    """,
    tags=("pipeline", "graph", "join", "large-output"),
)
def g_link_pred(spark: SparkSession, sf: str) -> DataFrame:
    """Link prediction on the co-purchase graph: NON-adjacent part
    pairs ranked by common-neighbor Jaccard — "parts bought alongside
    the same third parts, but never yet together" (the
    recommendation-candidate generator). graph.link_prediction_jaccard
    with the hub cap at degree 50 and >= 2 shared neighbors; the
    oracle mirrors both prunes exactly.
    """
    from sparkflow_spark.graph import link_prediction_jaccard

    t = Tables(spark, sf)
    edges = frequent_item_pairs(
        t.lineitem.select(
            F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
        ),
        "basket",
        "item",
        min_support=2,
        max_basket=1000,
    ).select("item_a", "item_b")
    scored = link_prediction_jaccard(
        edges, "item_a", "item_b", min_common=2, max_degree=50
    )
    return scored.select(
        "node_a",
        "node_b",
        "common",
        "degree_a",
        "degree_b",
        (F.round(F.col("jaccard"), 6).cast("double") + F.lit(0.0)).alias("jaccard"),
    )


@register(
    "p_stratified_split",
    # The md5 variate and the rank cut are both replayed exactly: the
    # oracle re-derives u from the same hex slice, ranks within source
    # by (u, doc_id) — a total order, so ranks are engine-independent —
    # and cuts at floor(cum_p * n). Output is the per-(source, split)
    # contract: exact counts + id-sum (covers ASSIGNMENT, not just
    # sizes).
    oracle="""
        WITH u AS (
            SELECT doc_id, source,
                   ('0x' || substr(md5(doc_id::VARCHAR || ':42'), 1, 8))::UBIGINT
                   / 4294967296.0 AS u
            FROM documents
        ),
        r AS (
            SELECT doc_id, source,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY u, doc_id) AS rk,
                   COUNT(*) OVER (PARTITION BY source) AS n
            FROM u
        ),
        s AS (
            SELECT source, doc_id,
                   CASE WHEN rk <= floor(0.8 * n) THEN 'train'
                        WHEN rk <= floor(0.9 * n) THEN 'val'
                        ELSE 'test' END AS split
            FROM r
        )
        SELECT source, split, COUNT(*) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS id_sum
        FROM s GROUP BY source, split ORDER BY source, split
    """,
    tags=("pipeline", "sampling", "split"),
)
def p_stratified_split_q(spark: SparkSession, sf: str) -> DataFrame:
    """Stratified train/val/test split with EXACT per-stratum
    proportions (80/10/10 by source) — operators.stratified_exact_split.
    q77_hash_split's independent-assignment split gives binomial
    proportions; a training-mixture contract ("exactly 10% of every
    source held out") needs the rank-cut form. Deterministic end to
    end: md5 variate + total-order tie-break, so the same rows land in
    the same split on any engine, layout, or rerun. Rides the grouped
    two-phase global_rank — a hot stratum spreads across range
    partitions instead of serializing into one task."""
    from sparkflow_spark.operators import stratified_exact_split

    t = Tables(spark, sf)
    split = stratified_exact_split(
        t.documents.select("doc_id", "source"),
        id_col="doc_id",
        strata_cols=["source"],
        fractions={"train": 0.8, "val": 0.1, "test": 0.1},
    )
    return (
        split.groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
        )
        .transform(ordered, "source", "split")
    )


@register(
    "p_shard_assignment",
    oracle="""
        WITH s AS (
            SELECT doc_id, n_chars,
                   ('0x' || substr(md5(doc_id::VARCHAR || ':shard7'), 1, 8))::UBIGINT
                   % 16 AS shard
            FROM documents
        )
        SELECT CAST(shard AS BIGINT) AS shard, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS chars,
               MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        FROM s GROUP BY shard ORDER BY shard
    """,
    tags=("pipeline", "layout", "shard"),
)
def p_shard_assignment_q(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic shard assignment for training-data writers: shard
    = md5(doc_id) mod 16 — a pure content function, so re-running the
    export (or growing the corpus) never moves an existing doc between
    shards, and every engine derives the same layout. The registered
    query is the shard MANIFEST (per-shard counts / byte mass / id
    range — what a loader needs to plan epochs and what a balance
    monitor alerts on); the writer itself is
    ``df.withColumn("shard", ...).repartition("shard").write
    .partitionBy("shard")`` — one exchange keyed on the same
    expression, each shard a contiguous parquet dir. The md5 variate
    makes shard mass ~multinomial-even regardless of doc_id
    distribution (the fixture manifest shows every shard populated)."""
    t = Tables(spark, sf)
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shard7"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % 16
    )
    return (
        t.documents.select(F.col("doc_id"), F.col("n_chars"), shard.alias("shard"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .transform(ordered, "shard")
    )


@register(
    "p_bloom_known_users",
    oracle="""
        WITH corpus AS (
            SELECT DISTINCT user_id FROM events
            WHERE ts < TIMESTAMP '2024-01-25'
        ),
        inc AS (
            SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-25'
        )
        SELECT i.event_type,
               COUNT(*) AS n_events_known,
               COUNT(DISTINCT i.user_id) AS n_known_users
        FROM inc i JOIN corpus c ON i.user_id = c.user_id
        GROUP BY i.event_type ORDER BY i.event_type
    """,
    tags=("pipeline", "bloom", "ingest"),
)
def p_bloom_known(spark: SparkSession, sf: str) -> DataFrame:
    """Ingest-time membership against the historical corpus — "which
    incoming events come from already-known users" — via
    operators.bloom_ingest_membership: a bloom over corpus user ids
    (built once per corpus version, megabytes-sized) prunes the
    incoming batch with ZERO joins, then batch-sized candidate keys
    broadcast against the corpus for a scan-only exact verify — the
    corpus never shuffles per batch, unlike the plain semi-join this
    hash-checks against. The bloom has no false negatives and the
    verify removes its false positives, so the output is exactly the
    semi-join's (the oracle replays it as one).

    The bitmap is a PERSISTED versioned artifact (bloom_artifact.py:
    build-on-absence, load thereafter — the production cadence where
    one corpus scan amortizes over every ingest batch), not a per-call
    rebuild; the staleness contract (an old bitmap never produces a
    false negative for keys it covered) is pinned in
    tests/test_round8_ops.py. The stored artifact is validated against
    a file-stats fingerprint of the events table, so a REGENERATED
    fixture under the same sf key rebuilds the bitmap instead of
    probing a stale one (bloom false negatives = rows wrongly
    dropped)."""
    import os as _os

    from sparkflow_spark.bloom_artifact import ensure_bloom, file_stats_fingerprint
    from sparkflow_spark.catalog import warehouse_subdir
    from sparkflow_spark.operators import bloom_ingest_membership

    t = Tables(spark, sf)
    cut = F.lit("2024-01-25").cast("timestamp")
    corpus_keys = t.events.where(F.col("ts") < cut).select("user_id")
    incoming = t.events.where(F.col("ts") >= cut)
    bloom, _meta = ensure_bloom(
        spark,
        corpus_keys,
        warehouse_subdir(spark, "bloom_known_users", key=sf),
        "user_id",
        n_bits=1 << 20,
        k=5,
        corpus_version=f"{sf}@<2024-01-25",
        corpus_fingerprint=file_stats_fingerprint(_os.path.join(sf, "events.parquet")),
    )
    known = bloom_ingest_membership(
        spark, corpus_keys, incoming, "user_id", n_bits=1 << 20, k=5, bloom=bloom
    )
    return (
        known.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events_known"),
            F.countDistinct("user_id").alias("n_known_users"),
        )
        .transform(ordered, "event_type")
    )


# ---------------------------------------------------------------------------
# train -> score -> filter composition (r11 verdict ask #6, X171)

# The classifier head's feature vector: integer-exact quality components
# (X02 machinery) so the affine score is EXACTLY z256/256 with z256 an
# integer — every product is a multiple of 1/256, so numpy's dot, the
# Catalyst fold and DuckDB's list_sum all land on the identical double
# no matter the association order, and the percentile filter compares
# exact integers cross-engine. Weights are the FIXED post-training
# artifact (the judge-specified t2 shape: training itself is
# engine-defined — the trained-weights composition is pinned by t1).
_CLF_W = [64 / 256, -1 / 256, 4 / 256, 1 / 256]  # stop_hits, len_sum, n_bpe, n_chars
_CLF_B = -256 / 256

_CLF_ORACLE = """
    WITH feats AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> list_contains(['the','a','an','and','or','of','to','in','is',
                                        'are','was','it','that','this','with','for',
                                        'as','on','at','by','be'], x))) AS BIGINT)
                 AS stop_hits,
               CAST(list_sum(list_transform(string_split_regex(trim(text), '\\s+'),
                    x -> len(x))) AS BIGINT) AS len_sum,
               CAST(len(list_filter(string_split_regex(trim(regexp_replace(text,
                    '([.,;:!?()\\[\\]{}"''])', ' \\1 ', 'g')), '\\s+'),
                    x -> x != '')) AS BIGINT) AS n_bpe,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM documents),
    z AS (
        SELECT doc_id,
               64 * stop_hits - len_sum + 4 * n_bpe + n_chars - 256 AS z256
        FROM feats),
    thr AS (SELECT quantile_cont(z256, 0.25) AS t FROM z)
    SELECT z.doc_id, z.z256,
           CAST(ROUND(1.0 / (1.0 + exp(-(z.z256 / 256.0))), 2) AS DOUBLE) + 0.0
             AS prob
    FROM z, thr WHERE z.z256 >= thr.t
    ORDER BY z.doc_id
"""


@register(
    "p_classifier_filter_e2e",
    oracle=_CLF_ORACLE,
    tags=("pipeline", "ml", "text", "percentile"),
    memo=False,  # serving stage builds a predict fn per call
)
def p_classifier_filter_e2e(spark: SparkSession, sf: str) -> DataFrame:
    """Model-based corpus quality filtering, end to end (the reference's
    whole point — a model inside a pipeline — meeting the north-star
    corpus filter): per document, build the integer-exact 4-feature
    quality vector (stopword hits, token-length sum, BPE-ish token
    count, char count), score it through the FRAMEWORK-AGNOSTIC serving
    hook (ml/predict.PredictWith -> predict_batch_udf, numpy stub
    backend with the fixed post-training logistic head — m06 machinery),
    and drop the bottom quartile by score (X43's broadcast-percentile
    filter — one exact percentile aggregate, no global sort). Kept rows
    carry the exact integer logit (z256 = 256*z) and the rounded
    sigmoid probability.

    Feature weights are exact multiples of 1/256 over integer features,
    so the score is bit-reproducible across numpy/Catalyst/DuckDB and
    the filter boundary cannot straddle an ulp — the whole train-adjacent
    pipeline (featurize -> Arrow-batched model scoring -> percentile
    filter) hash-checks cross-engine. The TRAINED-weights composition
    (DistributedDL logistic head -> same serving stage -> same filter)
    is pinned by t1 (engine-defined trajectory).

    100 TB shape: featurize + score are narrow per-partition stages
    (Arrow batches, once-per-worker model build); the only exchanges are
    the 1-row percentile aggregate and its broadcast back.
    """
    import json as _json

    from sparkflow_spark.functions.text import (
        ENGLISH_STOPWORDS,
        bpe_ish_token_count,
        lower_tokens,
        tokens,
    )
    from sparkflow_spark.ml.predict import PredictWith

    t = Tables(spark, sf)
    stop_hits = F.size(
        F.filter(lower_tokens("text"), lambda tok: tok.isin(*ENGLISH_STOPWORDS))
    ).cast("bigint")
    len_sum = F.aggregate(
        tokens("text"), F.lit(0).cast("bigint"), lambda acc, tok: acc + F.length(tok)
    )
    feats = t.documents.select(
        "doc_id",
        F.array(
            stop_hits.cast("double"),
            len_sum.cast("double"),
            bpe_ish_token_count("text").cast("double"),
            F.length("text").cast("double"),
        ).alias("features"),
    )
    stage = PredictWith(
        inputCol="features",
        outputCol="_z",
        fnFactory="sparkflow_spark.ml.stub_backend:make_affine_predict_fn",
        fnFactoryArgs=_json.dumps({"W": _CLF_W, "b": _CLF_B}),
        returnTypeDDL="double",
        inputTensorShape=_json.dumps([4]),
    )
    scored = stage.transform(feats).select(
        "doc_id",
        F.round(F.col("_z") * 256).cast("bigint").alias("z256"),
        (
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_z"))), 2).cast(
                "double"
            )
            + F.lit(0.0)
        ).alias("prob"),
    )
    # r13 (guide §1.3/§4): the percentile aggregate AND the kept-rows
    # filter both reference `scored`, whose python-scored subplan never
    # canonicalizes equal across references — the before-plan ran the
    # whole featurize+ArrowEvalPython scoring chain TWICE (two parallel
    # Scan→ArrowEvalPython legs). One lazy materialization of the
    # narrow (doc_id, z256, prob) frame scores the corpus once; both
    # consumers read the ~24 B/row result. Values unchanged.
    scored = scored.localCheckpoint(eager=False)
    thr = scored.agg(F.percentile("z256", 0.25).alias("t"))
    return (
        scored.join(F.broadcast(thr))
        .where(F.col("z256") >= F.col("t"))
        .select("doc_id", "z256", "prob")
        .transform(ordered, "doc_id")
    )


# Shared by the classifier-evaluation entries: the X171 logit recomputed
# as its exact integer form, plus a deterministic binary label (token
# mass >= 200 — a fixed constant, so no percentile dependence).
_CLF_FEAT_CTES = """
    feats AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> list_contains(['the','a','an','and','or','of','to','in','is',
                                        'are','was','it','that','this','with','for',
                                        'as','on','at','by','be'], x))) AS BIGINT)
                 AS stop_hits,
               CAST(list_sum(list_transform(string_split_regex(trim(text), '\\s+'),
                    x -> len(x))) AS BIGINT) AS len_sum,
               CAST(len(list_filter(string_split_regex(trim(regexp_replace(text,
                    '([.,;:!?()\\[\\]{}"''])', ' \\1 ', 'g')), '\\s+'),
                    x -> x != '')) AS BIGINT) AS n_bpe,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM documents),
    z AS (
        SELECT doc_id,
               64 * stop_hits - len_sum + 4 * n_bpe + n_chars - 256 AS z256,
               CASE WHEN len_sum >= 200 THEN 1 ELSE 0 END AS y
        FROM feats)
"""


def _clf_scored(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, z256, y) — the X171 integer-exact logit and the fixed
    deterministic label, Spark side."""
    from sparkflow_spark.functions.text import (
        ENGLISH_STOPWORDS,
        bpe_ish_token_count,
        lower_tokens,
        tokens,
    )

    t = Tables(spark, sf)
    stop_hits = F.size(
        F.filter(lower_tokens("text"), lambda tok: tok.isin(*ENGLISH_STOPWORDS))
    ).cast("bigint")
    len_sum = F.aggregate(
        tokens("text"), F.lit(0).cast("bigint"), lambda acc, tok: acc + F.length(tok)
    )
    return t.documents.select(
        "doc_id",
        (
            64 * stop_hits
            - len_sum
            + 4 * bpe_ish_token_count("text").cast("bigint")
            + F.length("text").cast("bigint")
            - 256
        ).alias("z256"),
        (len_sum >= 200).cast("int").alias("y"),
    )


@register(
    "q129_calibration_bins",
    oracle=f"""
        WITH {_CLF_FEAT_CTES},
        bounds AS (SELECT MIN(z256) AS lo, MAX(z256) AS hi FROM z),
        binned AS (
            SELECT z.doc_id, z.y,
                   CAST(floor(((z.z256 - b.lo) * 10.0) / (b.hi - b.lo + 1))
                        AS BIGINT) AS bin
            FROM z, bounds b)
        SELECT bin, COUNT(*) AS n,
               CAST(SUM(y) AS BIGINT) AS n_pos,
               CAST(ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 4) AS DOUBLE)
                 + 0.0 AS pos_rate
        FROM binned GROUP BY bin ORDER BY bin
    """,
    tags=("pipeline", "ml", "evaluation"),
)
def q129_calibration_bins(spark: SparkSession, sf: str) -> DataFrame:
    """Classifier CALIBRATION report over the X171 quality scorer: ten
    equi-width score bins (X35's broadcast-bounds integer binning over
    the exact z256 logit — no global sort), each with observed
    positive rate for the deterministic token-mass label. The ML-eval
    table every scored-corpus pipeline reads before trusting a
    percentile cut — integer-exact except the one final division."""
    s = _clf_scored(spark, sf)
    bounds = s.agg(F.min("z256").alias("lo"), F.max("z256").alias("hi"))
    binned = s.join(F.broadcast(bounds)).select(
        "y",
        F.floor(
            (F.col("z256") - F.col("lo")) * 10.0 / (F.col("hi") - F.col("lo") + 1)
        )
        .cast("bigint")
        .alias("bin"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").cast("bigint").alias("n_pos"),
            (F.round(F.sum("y") / F.count(F.lit(1)), 4).cast("double") + F.lit(0.0)).alias(
                "pos_rate"
            ),
        )
        .transform(ordered, "bin")
    )


@register(
    "q130_pr_curve",
    oracle=f"""
        WITH {_CLF_FEAT_CTES},
        thr AS (
            {" UNION ALL ".join(
                f"SELECT CAST({d} AS BIGINT) AS decile, "
                f"quantile_cont(z256, {d / 10}) AS cut FROM z"
                for d in range(1, 10)
            )}),
        m AS (
            SELECT thr.decile,
                   SUM(CASE WHEN z.z256 >= thr.cut AND z.y = 1 THEN 1 ELSE 0 END) AS tp,
                   SUM(CASE WHEN z.z256 >= thr.cut AND z.y = 0 THEN 1 ELSE 0 END) AS fp,
                   SUM(CASE WHEN z.z256 < thr.cut AND z.y = 1 THEN 1 ELSE 0 END) AS fn
            FROM z, thr GROUP BY thr.decile)
        SELECT decile, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
               CAST(fn AS BIGINT) AS fn,
               CAST(ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fp, 0), 4) AS DOUBLE)
                 + 0.0 AS precision_,
               CAST(ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0), 4) AS DOUBLE)
                 + 0.0 AS recall_
        FROM m ORDER BY decile
    """,
    tags=("pipeline", "ml", "evaluation"),
)
def q130_pr_curve(spark: SparkSession, sf: str) -> DataFrame:
    """Precision/recall sweep over the X171 scorer at its nine decile
    thresholds: integer TP/FP/FN per threshold (exact interpolated
    percentiles over the integer logit are engine-identical), rounded
    P/R alongside. With q129 this is the evaluation loop for
    model-based corpus filtering — choose the percentile cut from the
    PR trade-off, then apply it with X43/X171 machinery. One scan
    builds the counts per threshold (a 9-row broadcast join), no
    per-threshold rescans."""
    s = _clf_scored(spark, sf)
    qs = [i / 10 for i in range(1, 10)]
    thr = s.agg(
        F.percentile("z256", qs).alias("cuts")
    ).select(
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(i) for i in range(1, 10)]).alias("decile"),
                F.col("cuts").alias("cut"),
            )
        ).alias("tc")
    ).select(F.col("tc.decile").cast("bigint").alias("decile"), F.col("tc.cut").alias("cut"))
    m = (
        s.join(F.broadcast(thr))
        .groupBy("decile")
        .agg(
            F.sum(((F.col("z256") >= F.col("cut")) & (F.col("y") == 1)).cast("int"))
            .cast("bigint")
            .alias("tp"),
            F.sum(((F.col("z256") >= F.col("cut")) & (F.col("y") == 0)).cast("int"))
            .cast("bigint")
            .alias("fp"),
            F.sum(((F.col("z256") < F.col("cut")) & (F.col("y") == 1)).cast("int"))
            .cast("bigint")
            .alias("fn"),
        )
    )
    pr = m.select(
        "decile",
        "tp",
        "fp",
        "fn",
        (
            F.round(F.col("tp") / F.nullif(F.col("tp") + F.col("fp"), F.lit(0)), 4)
            .cast("double")
            + F.lit(0.0)
        ).alias("precision_"),
        (
            F.round(F.col("tp") / F.nullif(F.col("tp") + F.col("fn"), F.lit(0)), 4)
            .cast("double")
            + F.lit(0.0)
        ).alias("recall_"),
    )
    return pr.transform(ordered, "decile")
