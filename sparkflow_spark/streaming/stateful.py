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

from sparkflow_spark.minipb import install_if_missing as _install_minipb
from sparkflow_spark.streaming.windows import run_stream_to_memory, stream_events

# transformWithStateInPandas speaks protobuf to the JVM state server.
# When the real google.protobuf wheel is absent (this sandbox has no
# package index), register the from-scratch minipb runtime in its
# place — at MODULE import, so executor python workers that unpickle
# the StatefulProcessor (importing this module) get it before pyspark's
# lazy `import ...StateMessage_pb2` runs. With the wheel installed this
# is a no-op and the official runtime wins.
_install_minipb()

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


def _build_user_stats_processor():
    """Build a FULLY SELF-CONTAINED StatefulProcessor instance.

    The TWS "driver worker" is a separate python process the JVM spawns
    with only pyspark.zip on its path — it gets neither the repo cwd
    nor the addPyFile package zip, so anything pickled by REFERENCE to
    ``sparkflow_spark`` dies there with ModuleNotFoundError at
    ``read_command``. The class below is defined inside this function,
    so cloudpickle ships it BY VALUE (methods, closure and all); its
    only imports are pandas/numpy/stdlib.

    The closure also embeds the SOURCE of :mod:`sparkflow_spark.minipb`
    as a string: ``__setstate__`` runs at unpickle time — before the
    worker's first protobuf-framed state-server message — and installs
    the runtime if ``google.protobuf`` is absent there (the constructor
    plants a marker attribute so pickle always calls ``__setstate__``).

    Semantics: (count, sum-in-integer-cents) per user. Cents keep the
    running sum EXACT and order-independent — the final emission is
    bit-comparable to a batch GROUP BY regardless of micro-batch
    arrival order. State is two longs per key: bounded by key
    cardinality, with getValueState's ttlDurationMs as the production
    expiry knob.
    """
    import inspect

    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    import sparkflow_spark.minipb as _minipb_mod

    minipb_src = inspect.getsource(_minipb_mod)

    def _bootstrap_protobuf() -> None:
        import types as _types

        try:
            import google.protobuf as _g

            if getattr(_g, "__file__", None) is not None or getattr(
                _g, "_MINIPB", False
            ):
                return
        except ImportError:
            pass
        mod = _types.ModuleType("sparkflow_minipb_embedded")
        exec(compile(minipb_src, "<sparkflow minipb embedded>", "exec"), mod.__dict__)
        mod.install_if_missing()

    class UserStatsProcessor(StatefulProcessor):
        def __init__(self):
            # non-empty instance state → pickle invokes __setstate__
            self._minipb_bootstrap = True

        def __setstate__(self, state):
            _bootstrap_protobuf()
            self.__dict__.update(state or {})

        def init(self, handle) -> None:
            self._state = handle.getValueState("stats", "c LONG, sum_cents LONG")

        def handleInputRows(self, key, rows, timerValues):
            import numpy as np
            import pandas as _pd

            c, cents = self._state.get() if self._state.exists() else (0, 0)
            for pdf in rows:
                c += len(pdf)
                v = pdf["value"].to_numpy(dtype="float64")
                cents += int(np.floor(v * 100 + 0.5).sum())
            self._state.update((c, cents))
            yield _pd.DataFrame({"user_id": [key[0]], "c": [c], "sum_cents": [cents]})

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            return iter(())

        def handleInitialState(self, key, initialState, timerValues) -> None:
            pass

        def close(self) -> None:
            pass

    return UserStatsProcessor()


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
    above so both stateful surfaces stay covered.

    Protobuf resolution: the state-server protocol is protobuf-framed
    (pyspark's generated StateMessage_pb2 wants the runtime named by
    :func:`_protobuf_requirement`); with the wheel absent the module-
    import hook above has already registered
    :mod:`sparkflow_spark.minipb` as ``google.protobuf`` — every
    round-trip through the JVM state server cross-checks that runtime
    against real protobuf on the JVM side."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:  # pragma: no cover - minipb install failed
        raise NotImplementedError(
            "transformWithStateInPandas needs a protobuf runtime "
            f"(`pip install '{_protobuf_requirement()}'`) and the bundled "
            "minipb fallback failed to install."
        ) from exc
    from sparkflow_spark.session import ensure_runtime_configs

    proc = _build_user_stats_processor()
    # TWS state lives in per-state-variable column families, which the
    # default HDFS-backed provider rejects — RocksDB (bundled with
    # Spark) is the supported store, and the production one at scale.
    # A DEDICATED session clone (not the shared streaming_session memo)
    # keeps the provider override from leaking into sibling queries.
    runner = ensure_runtime_configs(spark.newSession())
    runner.conf.set("spark.sql.shuffle.partitions", "4")
    runner.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    sdf = stream_events(runner, sf_dir, watermark=None, state_partitions=None)
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
