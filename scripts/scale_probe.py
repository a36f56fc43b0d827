#!/usr/bin/env python
"""Empirical scale probe: do the heavy operators scale linearly in rows?

The bench fixtures stop at sf0.1, so 100 TB behavior is otherwise argued
from plan shape alone (SCALE.md). This probe adds measurements: it
synthesizes 4x and 16x row-scaled copies of the sf0.1 tables in /tmp
(key-shifted unions — foreign keys stay consistent, per-copy documents
are token-tagged so near-dup structure scales linearly instead of
quadratically), runs the heavy operators at 1x/4x/16x, and reports
steady-state wall clock per scale plus the per-row cost ratio. A
scan-bound or one-shuffle operator should show t(16x)/t(1x) well under
16 (fixed overhead amortizes) and a flat-or-falling per-row cost; a
quadratic candidate generator would blow up instead.

It also asserts the plan INVARIANTS that make the scaling argument at
1000 executors: dimension joins stay broadcast at 16x, dedup candidate
generation stays non-cartesian, and aggregation keeps a map-side
partial phase.

Usage: python scripts/scale_probe.py [--scales 1,4,16] [--keep]
Writes one JSON line per (query, scale) and a summary table to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from sparkflow_spark.catalog import table_path
from sparkflow_spark.queries import load_all
from sparkflow_spark.session import build_session

SRC = "/root/testdata/sf0.1"
WORK = "/tmp/sparkflow_scale"

# Key-shift offsets: one round power-of-ten above the sf0.1 max of each
# key domain, so shifted copies never collide with the originals.
CK = 100_000  # c_custkey max ~15k at sf0.1
OK = 10_000_000  # o_orderkey max ~600k
DK = 100_000  # doc_id
EK = 100_000  # vec_id
UK = 1_000_000  # user_id

PROBES = [
    "q13_hash_agg_tpch_q1",
    "q14_count_distinct",
    "q06_multiway_join",
    "q21_window_running_sum",
    "t_token_count",
    "d_ngram_jaccard_pairs",
    "s_brute_force_top1",
    "st_tumbling_hour_counts",
    # round-5 additions: key-mod splits survive the key shifts (all
    # offsets are multiples of 10), so selectivity is scale-invariant
    "c_contamination",
    "t_tfidf_top_terms",
    "q61_sessionize",
    "q62_gap_fill_ffill",
    # round-5b additions (documents/embeddings/lineitem all scale;
    # d_edit_distance_join probes the symlinked part table so its
    # scaling is covered by the t1/oracle suite instead)
    "t_bm25_scores",
    "a_frequent_item_pairs",
    "s_pq_ann_top1",
    # round-5c additions: chunking scales with documents; SCD2 / funnel /
    # cohort with events (user_id shifts keep per-user histories intact
    # per copy); table diff with customer (the key shift rotates WHICH
    # residues mod 97/13 drift, but the drift FRACTIONS are constant, so
    # diff output stays linear in m); triangles with lineitem
    # (co-purchase edges never cross copies — orderkeys are shifted)
    "p_chunk_documents",
    "q65_scd2_history",
    "q70_funnel_stages",
    "q71_cohort_retention",
    "q64_table_diff",
    "g_triangle_count",
    # round-5d additions: checksum (customer+orders scans), multi-touch
    # interval join (events), dwell-time window+percentile (events),
    # A/B readout (events distinct+join)
    "q79_table_checksums",
    "q80_multitouch_attribution",
    "q84_dwell_time_stats",
    "q87_ab_test_readout",
    # round-6 additions: repetition/BPE-pairs scale with documents;
    # containment shares the capped jaccard index; k-means scales with
    # embeddings. d_semantic_dedup_pairs is deliberately NOT probed: its
    # registry form pins k=4 (the oracle-unrollable correctness probe)
    # and goes quadratic at fixed k — measured timing out at x16, which
    # is exactly why the production operator
    # (similarity.semantic_dedup_pairs) derives k from the data; its x16
    # numbers are recorded in SCALE.md round-6b.
    "t_repetition_score",
    "t_bpe_pair_counts",
    "d_containment_pairs",
    "s_kmeans_clusters",
    # round-6c additions: repeated-span mass (shingle window + doc
    # rollup — linear in shingle count); keep-longest dedup (shares the
    # capped jaccard index + component-keyed window); char entropy
    # (pure scan-bound string expression)
    "d_repeated_spans",
    "d_near_dedup_keep_longest",
    "t_char_entropy",
    # round-6e additions: portable md5 MinHash (band-bucket equi-join,
    # Σ C(bucket,2) not all-pairs), portable 16-bit SimHash + lexical
    # diversity (explode + hash aggs, linear in token count), debounce
    # (one (user,type) exchange + lag), heavy hitters (partial-agg
    # count + per-key-frame windows), int8 quantization (scan-bound
    # per-row HOFs), per-group OLS (five partial-agg'd moments)
    "d_minhash_md5_pairs",
    "d_simhash_md5_sigs",
    "t_lexical_diversity",
    "d_event_debounce",
    "q100_heavy_hitters",
    "s_quantize_int8",
    "q99_regression_per_group",
    # round-6e: TF-IDF cosine shares the capped inverted-index join
    # shape with jaccard (Σ C(df,2), df ≤ 20)
    "d_tfidf_cosine_pairs",
    # round-6g additions: skew report (two partial aggs over orders),
    # Spearman (2x global_rank range exchanges + high-card tie windows
    # over lineitem), rolling z-score (one user_id exchange, O(20)
    # frames), negative sampling (md5 global_rank + dense-integer
    # self-join over documents), link prediction (degree-capped wedge
    # join — co-purchase edges never cross copies, so wedge work is
    # linear in copies), SNM blocking (rank + n*w window candidates).
    # s_hard_negative_top1 is deliberately NOT probed: like
    # d_semantic_dedup_pairs' registry form it is the exact quadratic
    # verification twin (all anchors x corpus); the production path is
    # IVF-bucketed candidates + the same re-rank.
    "q104_join_key_skew",
    "q105_spearman_corr",
    "q106_rolling_zscore",
    "p_negative_pairs",
    "g_link_prediction",
    "d_sorted_neighborhood_pairs",
    # round-7 additions: the LOSSLESS prefix-filter jaccard join
    # (candidates bounded by Σ C(prefix-df,2) — rarity-bounded, not
    # capped; copies' token-tagging keeps shingle universes disjoint so
    # qualifying pairs stay linear in m) and the production
    # hard-negative miner (IVF cells derived ⌈n/256⌉ → per-anchor
    # candidate work constant in n; contrast the NOT-probed quadratic
    # twin s_hard_negative_top1).
    "d_prefix_jaccard_pairs",
    "s_hard_negative_ann",
    # round-7b additions: EWMA (one user_id exchange, O(4) lag state —
    # q106's shape), exact stratified split (grouped global_rank +
    # broadcast counts; documents scale with m), shard manifest (one
    # partial agg over a scan-bound md5 expression)
    "q107_ewma_per_event",
    "p_stratified_split",
    "p_shard_assignment",
    # round-7e additions: KEYLESS binned range joins. The copy harness
    # densifies the shared time axis (m× intervals AND m× points in the
    # same date range), so the TRUE match count grows ~m² — judge these
    # on per-output-pair cost (flat/falling = healthy), not per-input-row
    # wall clock; bin width controls candidate overhead, never matches.
    "q109_interval_join_shipments",
    "q110_overlap_join_congestion",
    # round-7f addition: bloom build is one corpus pass (amortized in
    # production; rebuilt per call here), probe+verify is batch-sized —
    # per-row cost should fall like any scan-bound shape.
    "p_bloom_known_users",
    # round-7g addition: the sketch table is days-sized; rolling union
    # cost scales with |days|, not events — expect near-flat.
    "q111_hll_rolling_distinct",
    # round-8 additions: the histogram-quantile rollup shares q111's
    # days-sized-state shape (one orders pass → days×bins table;
    # expect near-flat); the md5 LSH index lifecycle scales with the
    # corpus signing pass (build+append are O(corpus) md5 work, query
    # is probe-bounded) — expect linear-at-worst, falling per-row.
    "q112_histogram_quantile_rollup",
    "d_lsh_index_md5_query",
    # round-10 additions (r9 verdict ask #6 — the retrieval/e2e stack):
    # RRF fusion is two corpus-linear top-k legs (sort-limit, no corpus
    # window) + a k-row fusion join — expect falling per-row; the
    # training-bins e2e pipeline chains clean→bins over documents (all
    # partial-agg'd, doc-keyed exchanges — linear); decontamination's
    # eval-side shingle universe grows with m but stays the SMALL side
    # of one shingle-keyed join (train side scanned once — expect
    # near-linear). t_bm25_scores has ridden PROBES since round-5b; its
    # ×256 reading lands with this batch. The new exact-substring spans
    # kernel probes here too: token-tagged copies keep cross-copy grams
    # distinct, so flagged positions stay linear in m.
    "s_rrf_hybrid_topk",
    "p_training_bins_e2e",
    "p_decontaminate_keep",
    "d_exact_substring_spans",
    # round-11 additions (r10 verdict asks #1/#7): the hashed-gram
    # prescreen twin (8-byte hkey through the first exchange instead of
    # the 30-char gram — expect a lower wall clock AND a ~4× narrower
    # prescreen shuffle, reported separately by stream_state_probe.py);
    # the streaming/TWS stack gets its first ×N rows — tumbling agg
    # (state = windows, near-flat), stream-stream left join (state
    # bounded by the watermark horizon per key; user shift keeps
    # per-copy join structure intact so matches scale linearly), and
    # the TWS python processor (state = 2 longs/key; keys scale with m,
    # rows/key constant — per-row cost should be flat python work).
    "d_exact_substring_spans_hashed",
    "st_stream_stream_left_join",
    "st_tws_user_stats",
]

# Tables the probe queries never touch are symlinked, not rewritten.
COPY_AS_IS = ("region", "nation", "supplier", "part")

# --skew mode (round-6): the uniform key-shift keeps every key's mass
# constant; real corpora are Zipfian. The skew variant plants ONE hot
# key carrying ~10% of total mass in each window-heavy domain (plus a
# boilerplate shingle in ~30% of docs — above the d_ngram frequency
# cap, which must drop it) and compares steady-state wall clock against
# the uniform variant at the same scale. Expected behavior, recorded in
# SCALE.md: window operators (q19/sessionize/conversion/dwell) CANNOT
# be AQE-split on a hot PARTITION BY key — one task owns the hot key's
# 10% — so wall clock degrades by at most that serial fraction, not
# collapse; d_ngram must stay flat because the cap filter drops the
# planted stop-shingle before any pair is built.
HOT_CUST = 55_555_555
HOT_USER = 77_777_777
SKEW_PROBES = [
    "q19_window_topk_per_group",
    "q61_sessionize",
    "q88_session_conversion",
    "q84_dwell_time_stats",
    "d_ngram_jaccard_pairs",
    # round-7 (r6 verdict ask #8): the two user-keyed round-6g ops that
    # joined after the skew harness landed. q106 windows on user_id —
    # the hot user's ~10% serializes into one task's O(20)-frame pass
    # (degrade ≤ the serial fraction, no collapse); SNM rides
    # global_rank's RANGE exchange, which balances by row count, so a
    # hot sort key spreads across partitions and the probe should stay
    # ~flat.
    "q106_rolling_zscore",
    "d_sorted_neighborhood_pairs",
]


def generate_skew(spark, src_dir: str, dest: str) -> None:
    """Skewed twin of a generated dir: ~10% of orders to one customer,
    ~10% of events to one user, a hot 3-token shingle into ~30% of
    docs. Deterministic row selection (key mod 10) so reruns agree."""
    if os.path.isdir(dest):
        shutil.rmtree(dest)
    os.makedirs(dest)
    for name in ("region", "nation", "supplier", "part", "customer",
                 "lineitem", "embeddings"):
        os.symlink(os.path.realpath(table_path(src_dir, name)),
                   table_path(dest, name))
    orders = spark.read.parquet(table_path(src_dir, "orders"))
    orders.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 10 == 0, F.lit(HOT_CUST))
        .otherwise(F.col("o_custkey")),
    ).write.mode("overwrite").parquet(table_path(dest, "orders"))
    events = spark.read.parquet(table_path(src_dir, "events"))
    events.withColumn(
        "user_id",
        F.when(F.col("event_id") % 10 == 0, F.lit(HOT_USER))
        .otherwise(F.col("user_id")),
    ).write.mode("overwrite").parquet(table_path(dest, "events"))
    docs = spark.read.parquet(table_path(src_dir, "documents"))
    docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 < 3,
            F.concat(F.col("text"), F.lit(" hotaa hotbb hotcc")),
        ).otherwise(F.col("text")),
    ).write.mode("overwrite").parquet(table_path(dest, "documents"))


def _scaled(df, m: int, shift):
    """Union m key-shifted copies of df. shift(df, i) -> DataFrame."""
    out = shift(df, 0)
    for i in range(1, m):
        out = out.unionByName(shift(df, i))
    return out


# One full fixture date-span (orders 1995-01→2001-08 ≈ 2404 days) plus
# margin: under --shift-dates, copy i's dates move i spans forward so
# the time axis GROWS with the data (the real "more data = longer
# history" model). Without it, replication multiplies DENSITY in a
# fixed range — which makes keyless range/overlap joins' true answers
# (and any binned algorithm's per-bin work) quadratic in m by
# construction: at ×256 each 7-day bin holds 256× intervals AND 256×
# points, a 65536× per-bin candidate product no algorithm avoids
# while the output itself is quadratic. Density growth is a real
# operational regime (handle via narrower bins + the burst-salt knob,
# measured round-7e) but the wrong model for a growth probe.
_DATE_SHIFT_DAYS = 2420


def generate(spark, m: int, dest: str, shift_dates: bool = False) -> None:
    if os.path.isdir(dest):
        shutil.rmtree(dest)
    os.makedirs(dest)
    for name in COPY_AS_IS:
        os.symlink(table_path(SRC, name), table_path(dest, name))
    if m == 1:
        for name in ("customer", "orders", "lineitem", "documents", "embeddings", "events"):
            os.symlink(table_path(SRC, name), table_path(dest, name))
        return

    raw = {  # raw reads: events keeps its nanos bigint so copies match the source layout
        n: spark.read.parquet(table_path(SRC, n))
        for n in ("customer", "orders", "lineitem", "documents", "embeddings", "events")
    }

    def w(df, name):
        df.write.mode("overwrite").parquet(table_path(dest, name))

    w(_scaled(raw["customer"], m, lambda d, i: d.withColumn(
        "c_custkey", F.col("c_custkey") + F.lit(i * CK))), "customer")
    def _shift(d, i, col):
        if not shift_dates or i == 0:
            return d
        return d.withColumn(
            col, F.col(col) + F.expr(f"INTERVAL {i * _DATE_SHIFT_DAYS} DAY")
        )

    w(_scaled(raw["orders"], m, lambda d, i: _shift(d.withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(i * OK)).withColumn(
        "o_custkey", F.col("o_custkey") + F.lit(i * CK)), i, "o_orderdate")), "orders")
    w(_scaled(raw["lineitem"], m, lambda d, i: _shift(d.withColumn(
        "l_orderkey", F.col("l_orderkey") + F.lit(i * OK)), i, "l_shipdate")), "lineitem")
    # Tag every token with the copy index: shingle sets become DISJOINT
    # across copies, so true near-dup pairs scale linearly with m (a
    # plain duplication would make every doc match its m-1 clones and
    # the pair count quadratic in m — a property of the synthetic data,
    # not the algorithm under test).
    # copy 0 keeps the ORIGINAL text (only copies 1..m-1 are tagged):
    # cross-copy similarity is broken either way, and content-dependent
    # probes (t_bm25_scores' fixed query terms) would otherwise match
    # zero rows at every scaled size, measuring nothing.
    w(_scaled(raw["documents"], m, lambda d, i: d.withColumn(
        "doc_id", F.col("doc_id") + F.lit(i * DK)).withColumn(
        "text",
        F.col("text") if i == 0
        else F.regexp_replace("text", r"(\S+)", rf"$1{i}"))), "documents")
    w(_scaled(raw["embeddings"], m, lambda d, i: d.withColumn(
        "vec_id", F.col("vec_id") + F.lit(i * EK))), "embeddings")
    w(_scaled(raw["events"], m, lambda d, i: d.withColumn(
        "user_id", F.col("user_id") + F.lit(i * UK))), "events")


def run_probe(spark, registry, name: str, sf_dir: str) -> dict:
    fn = registry[name].fn
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        # noop sink, NOT count(): count() lets Catalyst prune unused
        # window/computed columns and would time a different plan.
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    rows = fn(spark, sf_dir).count()  # untimed sanity (e.g. pair counts linear in m)
    return {"cold": times[0], "steady": times[1], "rows": rows}


def skew_join_probe(spark, sf_dir: str) -> dict:
    """Forced SHUFFLE join keyed on the hot column — the case AQE's
    skew-join splitting exists for (window ops above can't be split;
    joins can). Broadcast is disabled for the probe because the real
    100 TB shape is fact⨝fact: orders shuffles on o_custkey, where the
    skewed twin gives one key ~10% of all rows. With
    ``spark.sql.adaptive.skewJoin.enabled`` (session default) AQE must
    split that oversized partition; we record wall clock and whether
    the final adaptive plan actually marked the join skewed."""
    orders = spark.read.parquet(table_path(sf_dir, "orders"))
    customer = spark.read.parquet(table_path(sf_dir, "customer"))
    # AQE's skew detector triggers on max(factor × median-partition,
    # thresholdInBytes) with a 256 MB default threshold — sized for
    # production shuffles, unreachable on a 9.6M-row toy shuffle. Scale
    # the thresholds DOWN proportionally so the probe demonstrates the
    # same decision the defaults make at the 100 TB design point.
    overrides = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    old = {k: spark.conf.get(k) for k in overrides}
    for k, v in overrides.items():
        spark.conf.set(k, v)
    try:
        def shape():
            return (
                orders.join(
                    customer, orders.o_custkey == customer.c_custkey, "left"
                )
                .groupBy("c_mktsegment")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("o_totalprice").alias("rev"),
                )
            )

        shape().collect()  # warm (5-row result; collect cost is nil)
        # Execute through the DataFrame's OWN QueryExecution — a
        # noop-write action plans a separate QueryExecution, leaving
        # this one's adaptive plan unexecuted (no final-plan skew
        # markers to read). A fresh shape per timing keeps the second
        # run honest (no cached final plan).
        q = shape()
        t0 = time.time()
        q.collect()
        steady = time.time() - t0
        plan = q._jdf.queryExecution().executedPlan().toString()
        return {
            "steady": round(steady, 3),
            "skew_split_applied": "skew=true" in plan
            and "skewed" in plan.lower(),
            "smj": "SortMergeJoin" in plan or "ShuffledHashJoin" in plan,
            "final_plan": "isFinalPlan=true" in plan,
        }
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def check_invariants(spark, registry, sf_dir: str) -> dict:
    """Plan-shape assertions at the largest scale."""
    out = {}
    plan = registry["q06_multiway_join"].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    out["q06_dim_join_broadcast"] = "BroadcastHashJoin" in plan
    plan = registry["d_ngram_jaccard_pairs"].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    out["dedup_non_cartesian"] = (
        "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    )
    plan = registry["q13_hash_agg_tpch_q1"].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    out["q13_partial_agg"] = "partial_" in plan or plan.count("HashAggregate") >= 2
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,4,16")
    ap.add_argument("--keep", action="store_true", help="keep generated parquet")
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated probe-name subset (incremental runs after "
        "adding probes; the full sweep stays the recorded baseline)",
    )
    ap.add_argument(
        "--reuse",
        action="store_true",
        help="reuse an existing generated dir from a prior --keep run "
        "instead of regenerating (incremental probe batches at big "
        "scale factors, where generation dominates)",
    )
    ap.add_argument(
        "--skew",
        action="store_true",
        help="run the Zipfian hot-key comparison (uniform vs skewed at "
        "the largest scale) instead of the uniform sweep",
    )
    ap.add_argument(
        "--shift-dates",
        action="store_true",
        help="shift each copy's order/ship dates one fixture-span "
        "forward (constant temporal density — the growth model for "
        "range/overlap-join probes; see _DATE_SHIFT_DAYS comment)",
    )
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    spark = build_session(app_name="scale_probe")
    registry = load_all()

    global PROBES, SKEW_PROBES
    if args.only and not (args.skew and args.only == "join"):
        only = args.only.split(",")
        unknown = [n for n in only if n not in registry]
        if unknown:
            raise SystemExit(f"unknown probe names: {unknown}")
        PROBES = only
        if args.skew:
            # the skew branch iterates SKEW_PROBES — apply the filter
            # there too instead of silently measuring the full set
            not_skew = [n for n in only if n not in SKEW_PROBES]
            if not_skew:
                raise SystemExit(
                    f"--only with --skew accepts only SKEW_PROBES members "
                    f"(or the literal 'join'); not skew probes: {not_skew}"
                )
            SKEW_PROBES = only

    if args.skew:
        m = scales[-1]
        uni = os.path.join(WORK, f"x{m}")
        skw = os.path.join(WORK, f"x{m}skew")
        print(f"# generating x{m} + skewed twin", file=sys.stderr)
        generate(spark, m, uni)
        generate_skew(spark, uni, skw)
        if args.only == "join":
            ju = skew_join_probe(spark, uni)
            js = skew_join_probe(spark, skw)
            print(json.dumps({"skew_join_probe": {"uniform": ju, "skewed": js}}))
            if not args.keep:
                shutil.rmtree(WORK, ignore_errors=True)
            return 0
        for name in SKEW_PROBES:  # warm shapes on the uniform dir
            registry[name].fn(spark, uni).write.format("noop").mode("overwrite").save()
        rows = []
        for name in SKEW_PROBES:
            ru = run_probe(spark, registry, name, uni)
            rs = run_probe(spark, registry, name, skw)
            print(json.dumps({"query": name, "scale": m, "uniform": ru, "skewed": rs}))
            rows.append((name, ru, rs))
        print(f"\n| query (x{m}) | uniform steady (s) | skewed steady (s) | skew/uniform |")
        print("|---|---|---|---|")
        for name, ru, rs in rows:
            r = rs["steady"] / max(ru["steady"], 1e-9)
            print(f"| {name} | {ru['steady']:.2f} | {rs['steady']:.2f} | {r:.2f}x |")
        ju = skew_join_probe(spark, uni)
        js = skew_join_probe(spark, skw)
        print(json.dumps({"skew_join_probe": {"uniform": ju, "skewed": js}}))
        print(
            f"| forced-shuffle join on hot key | {ju['steady']:.2f} | "
            f"{js['steady']:.2f} | "
            f"{js['steady'] / max(ju['steady'], 1e-9):.2f}x "
            f"(AQE skew-split applied: {js['skew_split_applied']}) |"
        )
        inv = check_invariants(spark, registry, skw)
        print(json.dumps({"invariants_at_skew": inv}))
        if not args.keep:
            shutil.rmtree(WORK, ignore_errors=True)
        return 0 if all(inv.values()) else 1

    dirs = {}
    for m in scales:
        suffix = "shift" if args.shift_dates else ""
        dest = os.path.join(WORK, f"x{m}{suffix}")
        if args.reuse and os.path.isdir(os.path.join(dest, "lineitem.parquet")):
            print(f"# reusing x{m} at {dest}", file=sys.stderr)
        else:
            print(f"# generating x{m} -> {dest}", file=sys.stderr)
            generate(spark, m, dest, shift_dates=args.shift_dates)
        dirs[m] = dest

    # Warm shared machinery (codegen families, python workers, streaming
    # engine) so per-scale numbers compare like-for-like.
    for name in PROBES:
        registry[name].fn(spark, dirs[scales[0]]).write.format("noop").mode("overwrite").save()

    results: dict[str, dict[int, dict]] = {}
    for name in PROBES:
        results[name] = {}
        for m in scales:
            r = run_probe(spark, registry, name, dirs[m])
            results[name][m] = r
            print(json.dumps({"query": name, "scale": m, **r}))

    inv = check_invariants(spark, registry, dirs[scales[-1]])
    print(json.dumps({"invariants_at_max_scale": inv}))

    base = scales[0]
    hdr = f"| query | " + " | ".join(f"x{m} steady (s)" for m in scales) + \
        f" | t(x{scales[-1]})/t(x{base}) | per-row cost x{scales[-1]} vs x{base} |"
    print("\n" + hdr)
    print("|" + "---|" * (len(scales) + 3))
    for name in PROBES:
        row = results[name]
        ratio = row[scales[-1]]["steady"] / max(row[base]["steady"], 1e-9)
        per_row = ratio / (scales[-1] / base)
        cells = " | ".join(f"{row[m]['steady']:.2f}" for m in scales)
        print(f"| {name} | {cells} | {ratio:.1f}x | {per_row:.2f}x |")

    if not args.keep:
        shutil.rmtree(WORK, ignore_errors=True)
    return 0 if all(inv.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
