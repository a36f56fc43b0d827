"""Persistent IVF vector index lifecycle: build / append / query.

The embedding-store twin of :mod:`lsh_index`: a corpus of vectors grows
continuously (new documents embedded per batch), and re-training the
coarse quantizer + re-assigning every old vector per increment is the
O(corpus) trap. Here the index persists as:

- ``centroids.json`` — the trained k-means centers (O(k·dim), tiny);
- ``cells/`` — (id, vec, norm, cell) parquet partitioned by cell.

**append** assigns NEW vectors to the FROZEN centroids (one broadcast
matmul pass over the delta — the FAISS operating model: the quantizer
is trained once on a representative sample, additions never retrain);
**query** scans only each probe's n_probe nearest cells with exact
cosine re-rank, and partition pruning keeps the scan to those cells.

Drift contract: a frozen quantizer degrades if the embedding
distribution shifts — callers monitor cell-occupancy skew (a cheap
GROUP BY over the cells table) and rebuild when it exceeds bounds;
append-after-distribution-shift is still CORRECT (exact re-rank), just
less selective.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession, Window

from sparkflow_spark.catalog import fan_out
from sparkflow_spark.functions.vector import dot_seq, l2_norm

_CENTROIDS_FILE = "centroids.json"


def _assign_cells(df: DataFrame, centroids: np.ndarray, id_col: str, vec_col: str) -> DataFrame:
    """(id, vec, norm, cell): nearest-centroid assignment as one Arrow
    pass with the centroid matrix broadcast in the UDF closure."""

    @F.pandas_udf(T.IntegerType())
    def cell_of(v):
        out = []
        for arr in v:
            x = np.asarray(arr, dtype=np.float64)
            out.append(int(((centroids - x) ** 2).sum(axis=1).argmin()))
        return pd.Series(out, dtype="int32")

    # NULL vectors would throw inside the Arrow batch (np.asarray(None));
    # they carry no index information — drop them here (build and query
    # apply the same isNotNull guard on their own inputs)
    return df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        l2_norm(vec_col).alias("norm"),
        cell_of(F.col(vec_col)).alias("cell"),
    )


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 42,
    train_max_rows: int = 65536,
) -> None:
    """Train the coarse quantizer (distributed k-means) and persist
    centroids + cell-partitioned assignments. Overwrites ``path``.

    Two scale rules, both measured at 64× bench data (SCALE.md
    round-7h):

    * the quantizer trains on a deterministic SAMPLE capped at
      ``train_max_rows`` (the FAISS operating model — tens to a few
      hundred training points per centroid suffice); Lloyd's cost is
      then O(k · train_max_rows) instead of O(k · n), while cell
      ASSIGNMENT still covers every row (one model.transform pass).
    * the cells table repartitions ON the cell id before the
      partitioned write — ONE file per cell, not one per (cell ×
      input-partition). Thousands of sub-``openCostInBytes`` files
      collapse Spark's file packing (maxSplitBytes floors at the open
      cost, so every file becomes its own scan task): the unfixed
      layout cost 32,000 scan tasks ≈ 350 s of pure task scheduling
      per query at 64×.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        F.col(vec_col),
        array_to_vector(F.transform(vec_col, lambda x: x.cast("double"))).alias("_fv"),
    )
    n = feats.count()
    train = feats
    if n > train_max_rows:
        # oversample slightly so the post-limit frame still covers the
        # cap; sample+limit keeps the training set size deterministic.
        train = feats.sample(min(1.0, 1.2 * train_max_rows / n), seed=seed).limit(
            train_max_rows
        )
    model = KMeans(
        k=n_centroids, seed=seed, featuresCol="_fv", predictionCol="_cell"
    ).fit(train)
    centroids = np.stack(model.clusterCenters())
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _CENTROIDS_FILE), "w") as f:
        json.dump({"centroids": centroids.tolist(), "id_col": id_col, "vec_col": vec_col}, f)
    assigned = model.transform(feats).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        l2_norm(vec_col).alias("norm"),
        F.col("_cell").cast("int").alias("cell"),
    )
    assigned.repartition("cell").write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(path, "cells")
    )


def load_centroids(path: str) -> np.ndarray:
    with open(os.path.join(path, _CENTROIDS_FILE)) as f:
        return np.asarray(json.load(f)["centroids"], dtype=np.float64)


def append_to_ivf_index(spark: SparkSession, path: str, new_vecs: DataFrame) -> None:
    """Assign the DELTA to the frozen centroids (one Arrow pass, no
    retrain, no old-row touch) and append to the cells table."""
    with open(os.path.join(path, _CENTROIDS_FILE)) as f:
        meta = json.load(f)
    centroids = np.asarray(meta["centroids"], dtype=np.float64)
    out = _assign_cells(new_vecs, centroids, meta["id_col"], meta["vec_col"])
    # one file per touched cell per append (same file-packing rule as
    # the build; appends stay O(delta) in both rows and files)
    out.repartition("cell").write.mode("append").partitionBy("cell").parquet(
        os.path.join(path, "cells")
    )


def query_ivf_index(
    spark: SparkSession,
    path: str,
    probes: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    probe_id: str = "probe_id",
    vec_col: str = "embedding",
    broadcast_probes: bool | None = None,
) -> DataFrame:
    """Top-k cosine neighbors from the index → (probe_id, id, cosine,
    rnk): each probe explodes to its n_probe nearest cells, the cell
    join prunes the scan to those partitions, exact re-rank inside.

    ``broadcast_probes`` (round-6 advice fix): the probe side is
    exploded n_probe-way CARRYING FULL VECTORS, so an unconditional
    broadcast blows the driver/broadcast threshold for a large probe
    batch even though the API accepts an arbitrary DataFrame. Default
    ``None`` decides from the probe plan's size estimate (parquet
    footer stats / plan-time sizeInBytes — free, no job): broadcast
    only when the PRE-explosion estimate × n_probe stays under 64 MiB,
    else fall back to a shuffled hash join on ``cell``. Pass
    True/False to pin either strategy (True is the interactive
    small-probe-batch fast path; False is the bulk re-scoring path)."""
    centroids = load_centroids(path)
    # r13: fan a small index scan across the cores — the broadcast
    # probe join otherwise re-scores every probed-cell candidate inside
    # the index parquet's few row-group partitions (scale-adaptive
    # no-op once the index outgrows one scan split per core)
    cells = fan_out(spark.read.parquet(os.path.join(path, "cells")))
    # takedown filter: tombstoned vectors never surface as neighbors —
    # one broadcast anti-join against the (tiny) takedown table; the
    # top-k window ranks only survivors, so k results stay k results.
    tomb = _live_ivf_tombstones(spark, path)
    if tomb is not None:
        cells = cells.join(F.broadcast(tomb), on="id", how="left_anti")
    n_probe_eff = min(n_probe, centroids.shape[0])

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def nearest_cells(v):
        out = []
        for arr in v:
            x = np.asarray(arr, dtype=np.float64)
            d = ((centroids - x) ** 2).sum(axis=1)
            out.append(np.argsort(d)[:n_probe_eff].astype("int32").tolist())
        return pd.Series(out)

    p = probes.where(F.col(vec_col).isNotNull()).select(
        F.col(probe_id),
        F.col(vec_col).alias("_pvec"),
        l2_norm(vec_col).alias("_pn"),
        F.explode(nearest_cells(F.col(vec_col))).alias("cell"),
    )
    if broadcast_probes is None:
        est = int(
            str(probes._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
        # the unknown-stats sentinel (defaultSizeInBytes = Long.MaxValue)
        # must NOT read as "huge": an in-memory probe frame without
        # stats is far more likely a handful of vectors — but guessing
        # wrong there OOMs the driver, so treat unknown as NOT
        # broadcastable and let AQE convert the shuffled join back to a
        # broadcast at runtime if the built side turns out tiny.
        broadcast_probes = est < (64 << 20) // max(n_probe_eff, 1)
    den = F.col("_pn") * F.col("norm")
    probe_side = F.broadcast(p) if broadcast_probes else p
    scored = cells.join(probe_side, on="cell").select(
        probe_id,
        "id",
        # r13: the exact re-rank dot runs through the bit-exact Arrow
        # kernel — same left-to-right chain as the interpreted fold, at
        # d vectorized ops per batch instead of ~2d interpreted evals per
        # candidate row (the dominant cost of a bulk re-scoring query).
        F.when(den != 0, dot_seq("_pvec", "vec") / den).alias("cosine"),
    )
    w = Window.partitionBy(probe_id).orderBy(F.col("cosine").desc(), F.col("id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def cell_occupancy(spark: SparkSession, path: str) -> DataFrame:
    """(cell, n) — the drift monitor: skewed occupancy means the frozen
    quantizer no longer matches the distribution; rebuild when the
    max/median ratio exceeds the caller's bound."""
    return (
        spark.read.parquet(os.path.join(path, "cells"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_TOMBSTONES = "tombstones"


def delete_from_ivf_index(spark: SparkSession, path: str, ids: DataFrame) -> None:
    """Takedown support: tombstone vector ids (one O(delta) parquet
    append beside the index — the cell-partitioned table is NOT
    rewritten). Queries exclude tombstoned vectors immediately;
    :func:`vacuum_ivf_index` folds tombstones in physically. Same
    lifecycle as the LSH index's (lsh_index.py): delete → immediate
    logical exclusion → eventual physical removal, idempotent at every
    step."""
    with open(os.path.join(path, _CENTROIDS_FILE)) as f:
        meta = json.load(f)
    ids.select(F.col(meta["id_col"]).alias("id")).distinct().write.mode(
        "append"
    ).parquet(os.path.join(path, _TOMBSTONES))


def _live_ivf_tombstones(spark: SparkSession, path: str) -> DataFrame | None:
    from sparkflow_spark.lsh_index import _tombstone_data_files

    files = _tombstone_data_files(path)
    if not files:
        return None
    return spark.read.parquet(*files).select("id").distinct()


def vacuum_ivf_index(spark: SparkSession, path: str) -> int:
    """Physically remove tombstoned vectors: rewrite cells/ without
    them (repartition-per-cell, same one-file-per-cell layout rule as
    the build), swap via two renames, then clear the tombstone table.
    Crash between the renames leaves the live dir absent — queries
    fail LOUDLY and repair is renaming __old back; a crash before the
    tombstone clear re-applies the (now no-op) filter next query.
    Returns the number of ids vacuumed."""
    import shutil

    from sparkflow_spark.lsh_index import _clear_tombstone_files, _tombstone_data_files

    # snapshot the tombstone FILE list up front: the final clear deletes
    # exactly these files, so a delete_from_ivf_index append landing
    # mid-vacuum stays live instead of being silently discarded
    tomb_files = _tombstone_data_files(path)
    if not tomb_files:
        return 0
    tomb = F.broadcast(
        spark.read.parquet(*tomb_files).select("id").distinct().localCheckpoint()
    )
    n = tomb.count()
    src = os.path.join(path, "cells")
    tmp, old = src + "__vacuum", src + "__old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    kept = spark.read.parquet(src).join(tomb, on="id", how="left_anti")
    kept.repartition("cell").write.mode("overwrite").partitionBy("cell").parquet(tmp)
    os.rename(src, old)
    os.rename(tmp, src)
    shutil.rmtree(old)
    _clear_tombstone_files(path, tomb_files)
    return n
