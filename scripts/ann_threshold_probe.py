#!/usr/bin/env python
"""ANN candidate-set probe: how selective is the multi-probe LSH at the
threshold it is bench-checked at (0.4 — chosen because the fixtures'
max pair cosine is ~0.51, so the oracle is a true differential) versus
the threshold the operator exists for in production (>= 0.9 near-dup)?

The round-4 disclosure was one-sided: at 0.4 the candidate set is ~all
pairs (any pair-accepting configuration must probe broadly when the
accept region covers half the sphere). This probe measures the
counterpoint: at 0.9 with num_planes scaled up, candidates collapse to
a tiny fraction of C(n,2) while per-pair recall stays ~1 — the regime
where candidate generation is effectively linear in n.

Mirrors the candidate stage of dedup.embedding_near_duplicates_ann
(dedup.py — sigs explode + (tbl, code) equi-join + id_a < id_b dedup);
the exact-cosine verification is deliberately omitted because the
quantity under study is the verification WORKLOAD itself.

Usage: python scripts/ann_threshold_probe.py
Prints one JSON line per (sf, config) with candidate counts.
"""

from __future__ import annotations

import itertools
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from sparkflow_spark.catalog import cached_table, embedding_dim
from sparkflow_spark.session import build_session
from sparkflow_spark.similarity import _hyperplanes, rh_signatures_batched

CONFIGS = [
    # (label, threshold the config targets, num_planes, num_tables, probe_hamming)
    ("bench_0.4", 0.4, 8, 16, 2),
    ("prod_0.9", 0.9, 16, 16, 2),
]


def candidate_count(df, dim, num_planes, num_tables, probe_hamming, seed=42) -> int:
    masks = [0]
    for r in range(1, probe_hamming + 1):
        for pos in itertools.combinations(range(num_planes), r):
            masks.append(sum(1 << b for b in pos))
    tables = [(t, _hyperplanes(dim, num_planes, seed + 1000 * t)) for t in range(num_tables)]
    sigs = (
        df.select(F.col("vec_id"), rh_signatures_batched("embedding", tables).alias("_sigs"))
        .select("vec_id", F.posexplode("_sigs").alias("tbl", "sig"))
        .localCheckpoint(eager=False)
    )
    a = sigs.select("tbl", F.col("sig").alias("code"), F.col("vec_id").alias("id_a"))
    b = sigs.select(
        "tbl",
        F.col("vec_id").alias("id_b"),
        F.explode(
            F.array(*[F.col("sig").bitwiseXOR(F.lit(m)).cast("long") for m in masks])
        ).alias("code"),
    )
    return (
        a.join(b, on=["tbl", "code"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .count()
    )


def recall_per_pair(cos: float, num_planes: int, num_tables: int, probe_hamming: int) -> float:
    q = 1.0 - math.acos(cos) / math.pi  # P(one hyperplane agrees)
    p_tbl = sum(
        math.comb(num_planes, i) * (q ** (num_planes - i)) * ((1 - q) ** i)
        for i in range(probe_hamming + 1)
    )
    return 1.0 - (1.0 - p_tbl) ** num_tables


def main() -> int:
    spark = build_session(app_name="ann_threshold_probe")
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        emb = cached_table(spark, sf_dir, "embeddings")
        n = emb.count()
        total_pairs = n * (n - 1) // 2
        dim = embedding_dim(spark, sf_dir)
        for label, thr, planes, tabs, probe in CONFIGS:
            cands = candidate_count(emb, dim, planes, tabs, probe)
            print(
                json.dumps(
                    {
                        "sf_dir": sf_dir,
                        "config": label,
                        "threshold": thr,
                        "num_planes": planes,
                        "num_tables": tabs,
                        "probe_hamming": probe,
                        "n_vectors": n,
                        "total_pairs": total_pairs,
                        "candidates": cands,
                        "candidate_frac": round(cands / total_pairs, 4),
                        "recall_at_threshold": round(
                            recall_per_pair(thr, planes, tabs, probe), 6
                        ),
                    }
                )
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
