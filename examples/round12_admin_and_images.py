#!/usr/bin/env python
"""Tour of the round-12 surfaces: SQL scripting / session variables,
the state-store reader, and perceptual image dedup via dHash — end to
end on the sf0.001 fixtures.

Run: python examples/round12_admin_and_images.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from sparkflow_spark.catalog import register_views
from sparkflow_spark.session import build_session


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_session(app_name="round12_example")
    register_views(spark, sf_dir)

    # -- SQL scripting: an engine-executed threshold-finding loop -------
    spark.conf.set("spark.sql.scripting.enabled", "true")
    band = spark.sql(
        """
        BEGIN
          DECLARE thr DOUBLE DEFAULT 1000.0;
          DECLARE n BIGINT DEFAULT 0;
          SET n = (SELECT COUNT(*) FROM orders WHERE o_totalprice > thr);
          WHILE n >= 500 DO
            SET thr = thr * 2;
            SET n = (SELECT COUNT(*) FROM orders WHERE o_totalprice > thr);
          END WHILE;
          SELECT thr AS threshold, n AS n_above,
                 COUNT(*) AS n_in_last_band
          FROM orders WHERE o_totalprice > thr / 2 AND o_totalprice <= thr;
        END
        """
    )
    print("scripted threshold fixpoint:", band.collect())

    # -- session variables + EXECUTE IMMEDIATE --------------------------
    spark.sql("DECLARE OR REPLACE VARIABLE cutoff DOUBLE")
    spark.sql("SET VARIABLE cutoff = (SELECT MAX(o_totalprice) * 0.5 FROM orders)")
    top = spark.sql(
        "EXECUTE IMMEDIATE 'SELECT COUNT(*) AS n FROM orders "
        "WHERE o_totalprice > :c' USING cutoff AS c"
    )
    print("orders above half-max price:", top.collect()[0]["n"])

    # -- state-store reader: audit a TWS checkpoint from SQL ------------
    from sparkflow_spark.streaming.state_reader import (
        state_metadata,
        tws_user_stats_state_audit,
    )

    audit = tws_user_stats_state_audit(spark, sf_dir)
    print("TWS state read back through the statestore source (top 5):")
    audit.orderBy("user_id").show(5)
    from sparkflow_spark.catalog import warehouse_subdir

    ck = warehouse_subdir(spark, "statestore_audit_ck", key=sf_dir)
    runner = audit.sparkSession
    state_metadata(runner, ck).select(
        "operatorName", "numPartitions", "maxBatchId"
    ).show(truncate=False)

    # -- perceptual image near-dup: dHash over the real decode path -----
    from sparkflow_spark import multimodal

    raster = bytes((7 * i) % 128 for i in range(72))
    bright = bytes(v + 64 for v in raster)  # no clip -> same dHash
    shuffled = bytes(reversed(raster))  # different gradients
    imgs = spark.createDataFrame(
        [
            (0, b"P5\n9 8\n255\n" + raster),
            (1, b"P5\n9 8\n255\n" + bright),
            (2, b"P5\n9 8\n255\n" + shuffled),
        ],
        "doc_id long, content binary",
    )
    hashes = multimodal.decode_image(imgs).select(
        "doc_id", multimodal.dhash_expr("pixels").alias("dhash")
    )
    hashes.show(truncate=False)
    pairs = multimodal.dhash_near_pairs(hashes, max_hamming=3)
    print("near pairs (expect exactly (0,1) at distance 0):")
    pairs.show()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
