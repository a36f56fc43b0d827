"""Exact substring-level dedup (Lee et al. 2022 "Deduplicating Training
Data Makes Language Models Better", the ExactSubstr pass) — suffix-array
-free, as three composable DataFrame stages:

1. ``exact_substring_spans``  — maximal cross-document duplicated spans
   (>= L chars), via duplicated-L-gram position marking (min!=max doc
   over ONE gram-keyed window — no self-join, boilerplate grams cost a
   sorted partition, never an O(df^2) bucket) + interval-union merge.
2. ``exact_substring_strip_list`` — per-doc duplicated-char mass and the
   keep/strip decision a training pipeline consumes.
3. the span-strip transform — each doc's text with the duplicated spans
   removed (the d_exact_substring_clean registry entry shows the full
   gap-segment reconstruction).

Run: python examples/exact_substring_dedup.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from sparkflow_spark.catalog import Tables
from sparkflow_spark.dedup import exact_substring_spans, exact_substring_strip_list
from sparkflow_spark.session import build_session


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_session(app_name="exact_substring_dedup", master="local[8]")
    docs = Tables(spark, sf_dir).documents

    spans = exact_substring_spans(docs, min_len=30).cache()
    print(f"duplicated spans (>=30 chars, cross-document): {spans.count()}")
    spans.orderBy(F.col("span_len").desc()).show(5, truncate=False)

    keep = exact_substring_strip_list(docs, min_len=30, max_dup_frac=0.2)
    agg = keep.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.col("keep").cast("int")).alias("kept"),
        F.round(F.avg("dup_frac"), 4).alias("avg_dup_frac"),
    ).first()
    print(
        f"strip list: {agg['docs']} docs, {agg['kept']} kept "
        f"(dup_frac < 0.2), avg dup_frac {agg['avg_dup_frac']}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
