"""Hybrid retrieval over a document corpus — the serving-side stack a
RAG deployment runs on this engine, composed from the same kernels the
registry hash-checks:

1. lexical leg   — BM25 top-k for a term query (t_bm25_scores shape);
2. dense leg     — ANN top-k over the embedding column (IVF index);
3. fusion        — reciprocal-rank fusion, Σ 1/(60 + rank) per leg
                   (s_rrf_hybrid_topk shape);
4. diversify     — MMR re-ranking of the fused pool (λ·relevance −
                   (1−λ)·max-sim-to-picked) via the unrolled Catalyst
                   form (similarity.mmr_rerank_unrolled).

Every stage is a DataFrame plan: the legs are sort-limit top-k (no
corpus-sized window), fusion is a k-row full-outer join, and MMR runs
k bounded rounds — at 100 TB the retrievers are the only stages that
see the corpus.

Run: python examples/hybrid_retrieval.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from sparkflow_spark import similarity
from sparkflow_spark.queries import load_all
from sparkflow_spark.session import build_session


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_session(app_name="hybrid_retrieval", master="local[4]")
    registry = load_all()

    fused = registry["s_rrf_hybrid_topk"].fn(spark, sf)
    print("=== RRF-fused top-10 (BM25 ⊕ cosine) ===")
    fused.show(10, truncate=False)

    # diversify the fused pool: join vectors back, then unrolled MMR
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    pool = fused.join(emb, "doc_id").select(
        F.lit(0).alias("probe_id"),
        F.col("doc_id").alias("vec_id"),
        F.col("rrf_score").alias("cosine"),
        "embedding",
    )
    diversified = similarity.mmr_rerank_unrolled(pool, k=5, lam=0.7)
    print("=== MMR-diversified final 5 ===")
    diversified.orderBy("mmr_rank").show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
