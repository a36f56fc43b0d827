"""Custom stateful streaming via ``applyInPandasWithState`` (Q39).

The canonical "running per-key aggregate with explicit state" operator:
per user_id, keep a count in GroupState and emit the updated total each
micro-batch. With AvailableNow over a static source the final emission
per key equals the batch ``GROUP BY user_id`` count — the t2 oracle.

State is O(1) per key (a single long), so at scale the state store stays
bounded by key cardinality, not event volume.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from sparkflow_spark.streaming.windows import run_stream_to_memory, stream_events

_OUT_SCHEMA = T.StructType(
    [T.StructField("user_id", T.LongType()), T.StructField("c", T.LongType())]
)
_STATE_SCHEMA = T.StructType([T.StructField("count", T.LongType())])


def _update_count(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (count,) = state.get if state.exists else (0,)
    for pdf in pdfs:
        count += len(pdf)
    state.update((count,))
    yield pd.DataFrame({"user_id": [key[0]], "c": [count]})


def running_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user event counts with explicit GroupState."""
    sdf = stream_events(spark, sf_dir, watermark=None)
    counts = sdf.groupBy("user_id").applyInPandasWithState(
        _update_count,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = run_stream_to_memory(counts, "update")
    # one emission per key per micro-batch; keep the final (max) total
    import pyspark.sql.functions as F

    return out.groupBy("user_id").agg(F.max("c").alias("c")).orderBy("user_id")


# ---------------------------------------------------------------------------
# transformWithState (Spark 4.x successor API to applyInPandasWithState)


_TWS_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("c", T.LongType()),
        T.StructField("sum_cents", T.LongType()),
    ]
)


class _UserStatsProcessor:
    """StatefulProcessor keeping (count, sum-in-integer-cents) per user.

    Cents accumulation keeps the running sum EXACT and order-independent
    — the final emission is bit-comparable to a batch GROUP BY on any
    engine regardless of micro-batch arrival order. State is two longs
    per key: the store is bounded by key cardinality, and the TTL knob
    (getValueState ttlDurationMs) is where production would expire
    abandoned keys.
    """

    def init(self, handle) -> None:
        self._state = handle.getValueState("stats", "c LONG, sum_cents LONG")

    def handleInputRows(self, key, rows, timerValues):
        import numpy as np

        c, cents = self._state.get() if self._state.exists() else (0, 0)
        for pdf in rows:
            c += len(pdf)
            v = pdf["value"].to_numpy(dtype="float64")
            cents += int(np.floor(v * 100 + 0.5).sum())
        self._state.update((c, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "c": [c], "sum_cents": [cents]}
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def handleInitialState(self, key, initialState, timerValues) -> None:
        pass

    def close(self) -> None:
        pass


def _protobuf_requirement() -> str:
    """The exact pip requirement the TWS gate must name: parsed from the
    ValidateProtobufRuntimeVersion(...) pin inside the INSTALLED
    pyspark's generated StateMessage_pb2.py, so a pyspark upgrade that
    regenerates against a newer protobuf updates the remedy
    automatically (tests assert the refusal carries this exact string).
    Falls back to the Spark-4.1 gencode pin if the module moves."""
    import os
    import re

    try:
        import pyspark

        src_path = os.path.join(
            os.path.dirname(pyspark.__file__),
            "sql",
            "streaming",
            "proto",
            "StateMessage_pb2.py",
        )
        with open(src_path) as fh:
            m = re.search(
                r"ValidateProtobufRuntimeVersion\(\s*[^,]+,\s*(\d+),\s*(\d+),\s*(\d+)",
                fh.read(),
            )
        if m:
            major, minor, patch = m.groups()
            return f"protobuf>={major}.{minor}.{patch},<{int(major) + 1}"
    except OSError:  # pragma: no cover - pyspark layout changed
        pass
    return "protobuf>=6.33.0,<7"  # pragma: no cover


def running_user_stats_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running (count, sum) via ``transformWithStateInPandas``
    — the Spark 4 state-v2 API (typed state handles, timers, TTL),
    exercised alongside the legacy ``applyInPandasWithState`` twin
    above so both stateful surfaces stay covered."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "transformWithStateInPandas needs the protobuf wheel (its "
            "state-server protocol is protobuf-framed: pyspark's generated "
            "pyspark/sql/streaming/proto/StateMessage_pb2.py validates a "
            "PUBLIC runtime >= its gencode version). Exact remedy: "
            f"`pip install '{_protobuf_requirement()}'` (pure-python wheel, "
            "no native deps; this sandbox has no package index, so the gate "
            "stays). The applyInPandasWithState twin (running_user_counts / "
            "st_stateful_user_counts) covers the custom-stateful-streaming "
            "contract here."
        ) from exc
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # subclass dynamically so module import works even if the API moves
    proc = type("UserStatsProcessor", (_UserStatsProcessor, StatefulProcessor), {})()
    sdf = stream_events(spark, sf_dir, watermark=None)
    stats = sdf.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=_TWS_OUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
    out = run_stream_to_memory(stats, "update")
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    # keep the final (highest-count) emission per key: every emission
    # for a key strictly increases c, so max-c IS the final state
    w = Window.partitionBy("user_id").orderBy(F.col("c").desc())
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "c", "sum_cents")
    )
