"""Round-13 surfaces end to end: column codecs, corpus curation, and
mergeable sketches.

Run:  python examples/codecs_and_curation.py [sf_dir]

Shows:
  1. Avro/Protobuf/CSV column codecs — encode event rows to wire
     bytes, decode back, quarantine corrupt payloads (dead-letter).
  2. Keyword topic tagging + URL provenance parsing for corpus
     curation.
  3. Mergeable exact-distinct (bitmap) and approx-top-k sketch
     rollups — the retained-state shapes an incremental 100 TB
     pipeline persists instead of rescanning.
  4. Matryoshka truncated-embedding retrieval (16-dim prefix vs full).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from sparkflow_spark.queries import load_all
from sparkflow_spark.session import build_session


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_session(app_name="codecs_and_curation")
    reg = load_all()
    for name, n in (
        ("q132_protobuf_column_codec", 5),
        ("p_protobuf_ingest_quarantine", 5),
        ("q134_csv_column_codec", 5),
        ("t_keyword_topic_tags", 5),
        ("q142_url_analytics", 5),
        ("q137_bitmap_distinct_rollup", 5),
        ("q145_approx_topk_merge", 8),
        ("s_matryoshka_top1", 10),
    ):
        print(f"\n=== {name} ===")
        reg[name].fn(spark, sf).show(n, truncate=90)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
