"""End-to-end training-data pipeline over the documents/embeddings
fixtures: profile → quality filter → PII redaction → exact dedup →
near-dedup (MinHash candidates → connected components) → eval-set
contamination check → per-source token-budget mixture → sequence
packing → language stats → nearest-neighbor probe, with free
observe() telemetry riding the final action.

This is the north-star composition the engine exists for; every stage
is a DataFrame op that scales by partitioning (see SCALE.md).

Run: python examples/llm_data_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from sparkflow_spark import dedup, similarity
from sparkflow_spark.catalog import Tables
from sparkflow_spark.functions.text import detect_lang, quality_score, token_count
from sparkflow_spark.session import build_session


def main(sf_dir: str = "/root/testdata/sf0.01"):
    spark = build_session(app_name="llm_data_pipeline", master="local[8]")
    t = Tables(spark, sf_dir)

    # 0. one-scan profile of the raw drop (nulls/distinct/ranges)
    from sparkflow_spark.operators import profile

    profile(t.documents, ["doc_id", "lang", "source", "n_chars"]).show()

    scored = t.documents.select(
        "doc_id", "text",
        quality_score("text").alias("quality"),
        detect_lang("text").alias("lang_pred"),
        token_count("text").alias("n_tokens"),
    )
    kept_quality = scored.filter(F.col("quality") >= 0.5)
    print(f"quality filter: {t.documents.count()} -> {kept_quality.count()} docs")

    # PII scrub BEFORE dedup: redaction normalizes per-user variance,
    # so near-dup detection sees the template (map-only, codegen'd)
    from sparkflow_spark.functions.text import redact_pii

    kept_quality = kept_quality.withColumn("text", redact_pii("text"))

    exact = dedup.exact_dedup(kept_quality)
    print(f"exact dedup: -> {exact.count()} docs")

    pairs = dedup.minhash_candidate_pairs(exact, num_hashes=64, bands=16).filter(
        F.col("est_jaccard") >= 0.5
    )
    final = dedup.near_dedup(exact, pairs)
    print(f"near dedup ({pairs.count()} candidate pairs): -> {final.count()} docs")

    # contamination gate: fraction of each held-out eval doc's shingles
    # present in the surviving train corpus (leaked evals score ~1.0)
    ev = t.documents.filter(F.col("doc_id") % 10 == 0)
    contam = dedup.ngram_contamination(
        final.filter(F.col("doc_id") % 10 != 0), ev, shingle_k=3
    )
    n_leaked = contam.filter(F.col("contamination") >= 0.8).count()
    print(f"contamination check: {n_leaked}/{ev.count()} eval docs leaked (>=0.8 overlap)")

    # mixture: cap each source shard's token mass, in doc_id order;
    # packing: assign survivors to fixed 512-token training bins.
    # Both are per-source running-sum windows — parallel across shards.
    from pyspark.sql import Window

    from sparkflow_spark.operators import observe_metrics

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    mixed = (
        final.join(t.documents.select("doc_id", "source"), "doc_id")
        .withColumn("cum", F.sum("n_tokens").over(w))
        .filter(F.col("cum") <= 2000)
        .withColumn("bin_id", F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(512)))
    )
    packed, obs = observe_metrics(
        mixed,
        "corpus",
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.max("bin_id").alias("max_bin"),  # observe() forbids distinct aggs
    )
    n_packed = packed.count()  # one action; telemetry rides it
    print(f"mixture+packing: -> {n_packed} docs; observed {obs.get}")

    final.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("docs"), F.sum("n_tokens").alias("tokens")
    ).orderBy("lang_pred").show()

    probes = t.embeddings.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    similarity.brute_force_topk(t.embeddings, probes, k=3).show()

    # streaming leg: the same dedup idea applied to a live event feed —
    # dropDuplicatesWithinWatermark keeps state bounded by event time
    # (a real ingest pipeline dedups the firehose BEFORE the batch
    # corpus ever forms; AvailableNow over the static fixture makes the
    # demo deterministic)
    from sparkflow_spark.streaming.windows import run_stream_to_memory, stream_events

    sdf = stream_events(spark, sf_dir, watermark="24 hours")
    deduped = sdf.select("user_id", "event_type", "ts").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
    n_unique = run_stream_to_memory(deduped, "append").count()
    print(f"streaming dedup: event feed -> {n_unique} unique (user, event_type) pairs")

    # One-call variant of the whole prep chain: the registry's
    # p_training_bins_e2e runs clean → exact dedup → 64/48 chunking →
    # per-source 256-token bin packing as a single hash-checked plan
    # (the document payload crosses the network exactly once).
    from sparkflow_spark.queries import load_all

    bins = load_all()["p_training_bins_e2e"].fn(spark, sf_dir)
    bins.groupBy("source").agg(
        F.countDistinct("bin_id").alias("bins"),
        F.sum("n_tokens").alias("tokens"),
    ).orderBy("source").show()

    # round-7 tail of the pipeline: EXACT-proportion stratified split
    # (every source contributes exactly ⌊p·n⌋ docs per split), the
    # deterministic shard layout a training loader reads, and batch
    # scoring through the framework-agnostic serving hook (here the
    # numpy stub backend; in production a Torch/TF/onnx factory).
    from sparkflow_spark.operators import stratified_exact_split

    split = stratified_exact_split(
        final.join(t.documents.select("doc_id", "source"), "doc_id"),
        id_col="doc_id",
        strata_cols=["source"],
        fractions={"train": 0.8, "val": 0.1, "test": 0.1},
    )
    split.groupBy("split").count().orderBy("split").show()

    shard = (
        F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"),
                                          F.lit(":shard7"))), 1, 8), 16, 10)
        .cast("bigint") % 8
    )
    split.withColumn("shard", shard).groupBy("shard").count().orderBy("shard").show()

    from sparkflow_spark.ml.predict import predict_with

    dim = len(t.embeddings.select("embedding").first()["embedding"])
    scored_vecs = predict_with(
        t.embeddings.select("vec_id", F.col("embedding").alias("features")),
        "sparkflow_spark.ml.stub_backend:make_affine_predict_fn",
        return_type="double",
        input_tensor_shape=[dim],
        W=[((i % 5) - 2) / 10.0 for i in range(dim)],
        b=0.05,
    )
    scored_vecs.orderBy(F.col("predicted").desc()).limit(3).show()
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
