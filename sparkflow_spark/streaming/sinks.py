"""Streaming sinks beyond the memory/console toys.

``foreachBatch`` is Structured Streaming's escape hatch to any batch
writer; the discipline that makes it production-grade is IDEMPOTENCE —
a micro-batch can be replayed after a failure, so the write must be
exactly-once under retries. The parquet sink below gets that by
partitioning the output by ``batch_id`` and using dynamic partition
overwrite: a replayed batch overwrites its own partition instead of
appending duplicates. (The same pattern carries to MERGE-capable table
formats — Delta/Iceberg — where batch_id becomes a dedup key.)
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


_MANIFEST = "_LATEST"


def _read_manifest(path: str) -> int | None:
    """Committed snapshot version from the ``_LATEST`` manifest, or
    None for a legacy/uninitialized table."""
    try:
        with open(os.path.join(path, _MANIFEST)) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def _commit_manifest(path: str, version: int) -> None:
    """Atomic commit: the snapshot write is many files and is NOT
    atomic (a reader listing ``v=N`` dirs can catch a half-written
    one), so publication is a single rename — write ``_LATEST.tmp``,
    fsync, ``os.replace`` onto ``_LATEST``. POSIX rename atomicity
    means every reader sees either the old pointer or the new one,
    never a torn snapshot. (On object stores, swap this for the table
    format's log commit — same single-pointer principle as Delta's
    ``_last_checkpoint`` / Iceberg's version-hint.)"""
    tmp = os.path.join(path, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        f.write(str(version))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, _MANIFEST))


def stream_to_partitioned_parquet(
    sdf: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    checkpoint_dir: str | None = None,
) -> None:
    """Run a streaming DataFrame to completion (AvailableNow) into a
    parquet directory, exactly-once under micro-batch replay.

    Layout: ``path/batch_id=N/[partition_cols...]``. Each micro-batch
    writes with dynamic partition overwrite scoped to its own batch_id
    partition — a retried batch replaces, never duplicates. Downstream
    readers see one directory; batch_id behaves like any partition
    column (prunable, droppable).

    Append-mode only by design: under ``complete``/``update`` every
    batch re-emits rows for keys earlier batches already wrote, and the
    batch_id layout would retain the stale copies — a MERGE-capable
    table format keyed on the group columns is the right sink there, so
    this function pins ``append`` instead of corrupting silently.

    The checkpoint is STABLE per output path and lives INSIDE it
    (``path/_checkpoint``, override with ``checkpoint_dir``):
    replay-idempotence only holds when a restarted run resumes the same
    offset log and batch ids — a fresh random checkpoint would re-batch
    the input and leave any partially written old partition in place
    (round-3 review finding). Co-locating it couples the two lifetimes:
    deleting the output also resets the offset log (a /tmp checkpoint
    would survive and make the rerun a silent no-op), and losing the
    checkpoint alone can't strand stale batches. Underscore-prefixed
    dirs are invisible to parquet readers, so downstream scans are
    unaffected.
    """
    if checkpoint_dir is None:
        checkpoint_dir = os.path.join(path, "_checkpoint")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            # writer-scoped option, not a session-conf set-then-restore
            # (that pattern races with concurrent writers — the same
            # reasoning as streaming_session's conf isolation)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id", *(partition_cols or []))
            .parquet(path)
        )

    q = (
        sdf.writeStream.foreachBatch(write_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_merge_to_parquet(
    sdf: DataFrame,
    path: str,
    keys: list[str],
    order_col: str | None = None,
    checkpoint_dir: str | None = None,
    batch_listener=None,
    op_col: str | None = None,
) -> str:
    """Streaming CDC/upsert sink: maintain a keyed parquet table where
    each micro-batch MERGEs (last-write-wins per key) into the previous
    state — the pattern a Delta/Iceberg `MERGE INTO` sink runs, built on
    plain parquet with explicit versioning.

    Layout: ``path/v=N`` (N = micro-batch id), each version a COMPLETE
    table snapshot; readers take the highest version (``latest_version``
    below). Exactly-once under micro-batch replay falls out of
    determinism: version N is a pure function of version N-1 and batch
    N's data, so a replayed batch OVERWRITES ``v=N`` with identical
    contents instead of double-applying. Within a batch, duplicate keys
    collapse to one row first (max ``order_col`` wins, or max over all
    columns' struct if none given) because MERGE with ambiguous source
    keys has no defined answer (operators.merge_upsert's contract).

    With ``order_col`` the merge is TRUE CDC arbitration, not
    last-batch-wins: a delta row only replaces the table row when its
    order value is higher, so out-of-order file discovery or replayed
    old data cannot regress a key (the Delta/Iceberg ``MERGE ... WHEN
    MATCHED AND s.seq > t.seq`` idiom); only CONTESTED keys pay the
    arbitration window. Without ``order_col`` the delta always wins —
    plain upsert.

    Scale notes: per-batch cost is one broadcast anti-join (delta key
    set vs table) + union + full snapshot write — the snapshot write is
    the price of transactionless parquet and is what a real table format
    replaces with delta logs; at 100 TB you point this same foreachBatch
    body at Delta/Iceberg `MERGE INTO` and keep the dedup/ordering
    logic. The dedup-within-batch is a per-key window, keyed shuffle of
    the (small) delta only.

    ``batch_listener`` (optional ``Callable[[int], None]``) is invoked
    with the batch id BEFORE each merge — an observability hook for
    metrics/logging. An exception it raises fails the query mid-stream
    exactly like an executor-side fault, which is also how the
    checkpoint-recovery test simulates a crash: committed batches stay
    committed, the in-flight batch replays on restart (same batch id,
    same file set from the offset log) and deterministically overwrites
    its own ``v=N``.

    ``op_col`` (takedown/retraction support): when set, the stream
    carries a change-op column and a row whose op is ``delete`` is a
    KEY TOMBSTONE — it participates in per-key arbitration like any
    row (with ``order_col``, a delete only wins over rows it outranks,
    so a late-arriving old delete cannot resurrect-by-removal), and
    when it wins, the key is ABSENT from the new snapshot. The op
    column itself never lands in the snapshot (snapshots store state,
    not change feeds), so ``snapshot_changes`` diffing two committed
    versions reports the removal as its own ``_op='delete'`` row —
    the two delete paths compose. This is the MERGE ... WHEN MATCHED
    AND s.op = 'D' THEN DELETE idiom of Delta/Iceberg sinks.

    With ``order_col``, winning tombstones are RETAINED (hidden
    ``v=N/_tombstones/`` parquet, invisible to snapshot readers via
    the underscore rule) and re-enter every later arbitration: a LATE
    out-of-order row arriving after its key's delete still loses to
    the higher-ordered tombstone instead of resurrecting the key — so
    the final state is a pure function of the event SET, not the
    batch split (the property the st_cdc_delete_snapshot oracle
    checks). Tombstones here are retained indefinitely; a production
    deployment adds retention GC once the low-watermark passes (the
    Cassandra/Delta tombstone-retention trade). Without ``order_col``
    there is no cross-batch ordering to defend, so deletes apply
    batch-locally (delta-wins) and nothing is retained.

    Returns the path of the final version directory.
    """
    from pyspark.sql import Window

    from sparkflow_spark.operators import merge_upsert

    if checkpoint_dir is None:
        checkpoint_dir = os.path.join(path, "_checkpoint")

    # table metadata sidecar (keys + arbitration column): what
    # downstream consumers (snapshot_changes) need to diff snapshots
    # without re-supplying the sink's contract. Written before the
    # stream starts; idempotent under restarts.
    os.makedirs(path, exist_ok=True)
    import json as _json

    with open(os.path.join(path, "_meta.json"), "w") as f:
        _json.dump({"keys": list(keys), "order_col": order_col}, f)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_listener is not None:
            batch_listener(batch_id)
        spark = batch_df.sparkSession
        if op_col is not None and op_col not in batch_df.columns:
            raise ValueError(
                f"op_col={op_col!r} not in stream columns {batch_df.columns}"
            )
        # snapshots store STATE: the op column is arbitration-time-only
        cols = [c for c in batch_df.columns if c != op_col]
        ver_dir = os.path.join(path, f"v={batch_id}")
        # prev resolves through the COMMITTED manifest, never a dir
        # listing: a crash after a snapshot write but before its
        # manifest flip leaves a complete-looking-but-unpublished (or
        # torn) v=K dir, and reading it as prev would resurrect an
        # uncommitted state. The manifest can only point below
        # batch_id (it flips after a batch succeeds, and replay reuses
        # the original id); the dir-scan fallback covers legacy tables
        # written before the manifest existed.
        m = _read_manifest(path)
        prev = None
        if m is not None and m < batch_id:
            cand = os.path.join(path, f"v={m}")
            if os.path.isdir(cand):
                prev = cand
        if prev is None:
            for i in range(batch_id - 1, -1, -1):
                cand = os.path.join(path, f"v={i}")
                if os.path.isdir(cand):
                    prev = cand
                    break
        ordering = (
            F.col(order_col)
            if order_col
            else F.struct(*[F.col(c) for c in cols if c not in keys])
        )
        w = Window.partitionBy(*keys).orderBy(ordering.desc())
        delta = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        is_del = (
            F.lower(F.col(op_col)) == "delete" if op_col is not None else F.lit(False)
        )
        tombs = None  # retained tombstones (op_col + order_col path)
        if prev is None:
            merged = delta.where(~is_del).select(*cols)
            if op_col is not None and order_col is not None:
                tombs = delta.where(is_del).select(*cols)
        elif order_col is None:
            # no ordering column → delta wins (plain upsert); a delete
            # row wins its key and removes it
            target = spark.read.parquet(prev).select(*cols)
            if op_col is None:
                merged = merge_upsert(target, delta, keys)
            else:
                dels = F.broadcast(delta.where(is_del).select(*keys).distinct())
                merged = merge_upsert(
                    target.join(dels, keys, "left_anti"),
                    delta.where(~is_del).select(*cols),
                    keys,
                )
        else:
            # CDC arbitration: the HIGHER order_col wins even when the
            # table row is newer than the arriving delta (out-of-order
            # file discovery, replays). Only CONTESTED keys pay the
            # window: uncontested target rows pass through a broadcast
            # anti-join (map-side filter — the 100 TB table never
            # shuffles), contested ones union with the delta and take
            # per-key max order.
            target = spark.read.parquet(prev).select(*cols)
            if op_col is not None:
                # stored rows re-enter arbitration as upserts; stored
                # TOMBSTONES re-enter as deletes — a late old row must
                # outrank the tombstone to resurrect the key (it can't,
                # by definition of "late")
                target = target.withColumn(op_col, F.lit("upsert"))
                prev_tomb_dir = os.path.join(prev, "_tombstones")
                if os.path.isdir(prev_tomb_dir):
                    target = target.unionByName(
                        spark.read.parquet(prev_tomb_dir)
                        .select(*cols)
                        .withColumn(op_col, F.lit("delete"))
                    )
            dkeys = F.broadcast(delta.select(*keys).distinct())
            kept = target.join(dkeys, keys, "left_anti")
            contested = target.join(dkeys, keys, "left_semi")
            winners = (
                contested.unionByName(delta)
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
            if op_col is not None:
                survivors = kept.unionByName(winners)
                merged = survivors.where(~is_del).select(*cols)
                tombs = survivors.where(is_del).select(*cols)
            else:
                merged = kept.select(*cols).unionByName(winners.select(*cols))
        merged.write.mode("overwrite").parquet(ver_dir)
        if tombs is not None:
            # retained tombstones ride INSIDE the version dir (written
            # after the snapshot overwrite wiped it; underscore prefix
            # keeps them invisible to snapshot readers) so vacuum and
            # replay-overwrite handle them with the version they bound
            tombs.write.mode("overwrite").parquet(
                os.path.join(ver_dir, "_tombstones")
            )
        # publish AFTER the snapshot is fully on disk — the atomic
        # rename is the commit point; readers resolving through the
        # manifest can never observe the in-progress write above
        _commit_manifest(path, batch_id)

    q = (
        sdf.writeStream.foreachBatch(write_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return latest_version(path)


def latest_version(path: str) -> str:
    """The COMMITTED snapshot directory of a stream_merge table.

    Resolves through the ``_LATEST`` manifest (the atomic commit
    pointer): a ``v=N`` directory whose write crashed before its
    manifest flip is invisible here, so readers never see a torn
    snapshot. Legacy tables without a manifest fall back to the
    highest ``v=N`` dir (the pre-manifest behavior, torn-read window
    and all)."""
    m = _read_manifest(path)
    if m is not None:
        target = os.path.join(path, f"v={m}")
        if not os.path.isdir(target):
            raise FileNotFoundError(
                f"manifest points at missing snapshot {target} — "
                "vacuum/manual deletion removed a committed version"
            )
        return target
    versions = [
        int(d.split("=", 1)[1])
        for d in os.listdir(path)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    ]
    if not versions:
        raise FileNotFoundError(f"no v=N snapshots under {path}")
    return os.path.join(path, f"v={max(versions)}")


def vacuum_versions(path: str, keep_last: int = 2) -> list[str]:
    """Retention for the versioned-snapshot layout: delete all but the
    newest ``keep_last`` ``v=N`` directories and return the removed
    paths. Every snapshot is a COMPLETE table (version N does not read
    N-1 at query time), so old versions are pure storage cost — but at
    least the latest must survive (``keep_last >= 1`` enforced) and the
    PREVIOUS version is worth keeping while a restarted stream could
    still be re-deriving N from N-1 after checkpoint loss. Concurrency
    contract: run from the table's maintainer (the foreachBatch driver
    or an offline janitor), not concurrently with a reader pinned to an
    old version — same rule as any snapshot-retention vacuum.
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (the latest snapshot must survive)")
    versions = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(path)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    )
    # The manifest-pointed version is protected UNCONDITIONALLY: an
    # UNCOMMITTED torn v=N from a crashed write can sort ABOVE the
    # committed snapshot, and counting it toward keep_last would let
    # keep_last=1 delete the only committed version.
    committed = _read_manifest(path)
    removed = []
    for v in versions[:-keep_last]:
        if v == committed:
            continue
        target = os.path.join(path, f"v={v}")
        shutil.rmtree(target)
        removed.append(target)
    return removed


def stream_append_to_lsh_index(
    sdf: DataFrame,
    index_path: str,
    checkpoint_dir: str | None = None,
):
    """Continuously maintain a persistent MinHash-LSH dedup index from a
    document stream: each micro-batch's docs are signed with the
    index's STORED params and appended to the banded bucket table
    (lsh_index.append_to_lsh_index — O(batch) work, no old-row touch).

    The index must exist (build_lsh_index, possibly on an empty seed
    frame: that persists the params sidecar that every append reads).
    Exactly-once: parquet append per batch is idempotent only through
    the checkpoint — a replayed batch after checkpoint loss would
    duplicate bucket rows, which the QUERY path tolerates
    (dropDuplicates on candidate pairs) but inflates; production sinks
    put the bucket table in a table format with MERGE. Returns the
    started StreamingQuery (AvailableNow trigger; caller awaits)."""
    from sparkflow_spark.lsh_index import append_to_lsh_index

    if checkpoint_dir is None:
        checkpoint_dir = os.path.join(index_path, "_stream_checkpoint")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_to_lsh_index(batch_df.sparkSession, index_path, batch_df)

    return (
        sdf.writeStream.foreachBatch(write_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_append_to_ivf_index(
    sdf: DataFrame,
    index_path: str,
    checkpoint_dir: str | None = None,
):
    """Continuously maintain a persistent IVF vector index from an
    embedding stream: each micro-batch is assigned to the index's
    FROZEN centroids (vector_index.append_to_ivf_index — one Arrow
    pass over the delta, no retrain, no old-row touch) and appended to
    the cell-partitioned table. The FAISS operating model for a growing
    corpus: centroids train once on a sample, inserts are O(batch);
    periodic re-train is an offline rebuild, not a streaming concern.

    The index must exist (build_ivf_index). Exactly-once caveats are
    identical to :func:`stream_append_to_lsh_index` (checkpointed
    foreachBatch; a replayed batch after checkpoint LOSS would
    duplicate cell rows — queries then see duplicate candidates, which
    top-k dedups by id). Returns the started StreamingQuery
    (AvailableNow trigger; caller awaits)."""
    from sparkflow_spark.vector_index import append_to_ivf_index

    if checkpoint_dir is None:
        checkpoint_dir = os.path.join(index_path, "_stream_checkpoint")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_to_ivf_index(batch_df.sparkSession, index_path, batch_df)

    return (
        sdf.writeStream.foreachBatch(write_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def snapshot_changes(
    spark,
    path: str,
    from_version: int | None = None,
    to_version: int | None = None,
) -> DataFrame:
    """Change feed between two COMMITTED snapshots of a stream_merge
    table → the per-key delta a downstream incremental consumer
    processes instead of re-reading the whole dimension (the Delta
    ``table_changes`` / Iceberg changelog-scan idea on the versioned-
    parquet layout).

    Output: one row per changed key with ``_op`` ∈ {insert, update,
    delete} and the AFTER image (deletes carry the before image —
    the only image a delete has). Keys and the arbitration column come
    from the sink's ``_meta.json`` sidecar, so callers never re-supply
    the table's contract. Defaults: ``to_version`` = the manifest's
    committed version, ``from_version`` = to−1 (the latest delta).

    Shape at scale: one full-outer join keyed on the table keys — both
    sides are complete snapshots, so the join shuffles each once; the
    update check is a null-safe any-column comparison (``<=>``), no
    per-column rescan. Uncommitted/torn versions are not addressable:
    ``to_version`` beyond the manifest raises rather than diffing
    against a snapshot no reader is allowed to see.
    """
    import json as _json

    with open(os.path.join(path, "_meta.json")) as f:
        meta = _json.load(f)
    keys = meta["keys"]
    committed = _read_manifest(path)
    if committed is None:
        raise FileNotFoundError(f"no committed manifest under {path}")
    if to_version is None:
        to_version = committed
    if to_version > committed:
        raise ValueError(
            f"to_version={to_version} is beyond the committed manifest "
            f"({committed}) — uncommitted snapshots are not readable"
        )
    if from_version is None:
        from_version = to_version - 1
    if from_version >= to_version:
        raise ValueError(f"need from_version < to_version, got {from_version} >= {to_version}")

    new = spark.read.parquet(os.path.join(path, f"v={to_version}"))
    cols = new.columns
    val_cols = [c for c in cols if c not in keys]
    if from_version < 0:  # table birth: everything is an insert
        return new.select(F.lit("insert").alias("_op"), *cols)
    old = spark.read.parquet(os.path.join(path, f"v={from_version}")).select(*cols)

    # Side-presence markers, not key-column null probes: coalescing
    # across heterogeneous composite key types silently coerces (or
    # fails analysis), and an all-null key tuple would masquerade as
    # the missing side. A lit(1) tag per side is type-independent and
    # null only when the full-outer join produced no row on that side.
    n = new.select(F.lit(1).alias("_n_present"), *[F.col(c).alias(f"_n_{c}") for c in cols])
    o = old.select(F.lit(1).alias("_o_present"), *[F.col(c).alias(f"_o_{c}") for c in cols])
    cond = [n[f"_n_{k}"] == o[f"_o_{k}"] for k in keys]
    j = n.join(o, cond, "full_outer")
    some_new_key = j["_n_present"]
    some_old_key = j["_o_present"]
    changed = F.lit(False)
    for c in val_cols:
        changed = changed | ~j[f"_n_{c}"].eqNullSafe(j[f"_o_{c}"])
    op = (
        F.when(some_old_key.isNull(), F.lit("insert"))
        .when(some_new_key.isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    # after image for insert/update; before image for delete
    out_cols = [
        F.when(some_new_key.isNull(), j[f"_o_{c}"]).otherwise(j[f"_n_{c}"]).alias(c)
        for c in cols
    ]
    return j.select(op.alias("_op"), *out_cols).where(F.col("_op").isNotNull())


def read_snapshot(spark, path: str, version: int | None = None) -> DataFrame:
    """Time-travel read of a stream_merge table: the committed snapshot
    at ``version`` (default: latest committed). Only versions at or
    below the manifest are addressable — same rule as
    ``snapshot_changes`` — so a torn/unpublished ``v=N`` can never be
    read; a vacuumed version raises FileNotFoundError rather than
    silently reading nothing."""
    committed = _read_manifest(path)
    if committed is None:
        raise FileNotFoundError(f"no committed manifest under {path}")
    if version is None:
        version = committed
    if version > committed:
        raise ValueError(
            f"version={version} is beyond the committed manifest "
            f"({committed}) — uncommitted snapshots are not readable"
        )
    target = os.path.join(path, f"v={version}")
    if not os.path.isdir(target):
        raise FileNotFoundError(
            f"snapshot v={version} was vacuumed (retention removed it); "
            f"available committed head is v={committed}"
        )
    return spark.read.parquet(target)


_LEASE = "_WRITER_LEASE"


def acquire_writer_lease(path: str, ttl_seconds: float = 600.0) -> str:
    """Advisory single-writer fencing for a snapshot table.

    The manifest commit is atomic for READERS; two concurrent WRITERS
    would still interleave version writes (both deriving v=N from the
    same prev — lost update). This lease makes the single-writer
    assumption explicit and checkable: O_CREAT|O_EXCL creation of a
    lease file (atomic on POSIX) holding a random token + absolute
    expiry. A second writer gets WriterConflict while the lease is
    live; an EXPIRED lease (crashed writer) is taken over via atomic
    rename. Same-host POSIX scope — on an object store, swap for the
    store's conditional-put, same shape. Re-acquire (heartbeat) by
    calling again with your token via ``release`` + acquire, or just
    keep ttl ≥ the job's runtime.

    Returns the token; pass it to :func:`release_writer_lease`.
    """
    import json as _json
    import time as _time
    import uuid as _uuid

    os.makedirs(path, exist_ok=True)
    lease_path = os.path.join(path, _LEASE)
    token = _uuid.uuid4().hex
    payload = _json.dumps({"token": token, "expires": _time.time() + ttl_seconds})
    try:
        fd = os.open(lease_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        with os.fdopen(fd, "w") as f:
            f.write(payload)
        return token
    except FileExistsError:
        pass
    try:
        with open(lease_path) as f:
            held = _json.load(f)
    except (ValueError, FileNotFoundError):
        held = {"token": "?", "expires": 0.0}
    if held.get("expires", 0.0) > _time.time():
        raise WriterConflict(
            f"another writer holds the lease on {path} until "
            f"{held['expires']:.0f} (epoch); retry later or raise ttl"
        )
    # Stale lease (crashed writer): mutual-exclusive takeover. Two
    # contenders can BOTH observe the expired lease; last-writer-wins
    # os.replace plus a read-back does NOT exclude them (interleaving
    # A-replace, A-read-back, B-replace, B-read-back leaves both
    # believing they won). Exclusion comes from a per-GENERATION claim
    # file created with O_CREAT|O_EXCL, named by the expired lease's
    # identity (token+expiry): exactly one contender of this generation
    # can create it; every other gets FileExistsError and raises. The
    # winner publishes its lease, then removes the claim — later
    # acquirers hit the (now live) lease check, never this path.
    import hashlib as _hashlib

    gen = _hashlib.sha256(
        f"{held.get('token')}|{held.get('expires')}".encode()
    ).hexdigest()[:16]
    claim_path = lease_path + f".takeover.{gen}"
    try:
        cfd = os.open(claim_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        # a contender already claimed this generation. If the claimant
        # crashed before publishing (claim older than the ttl), clear
        # the wreck and STILL raise — the next acquire then races
        # through a fresh O_EXCL create, keeping this path exclusive.
        try:
            if _time.time() - os.stat(claim_path).st_mtime > ttl_seconds:
                os.remove(claim_path)
        except FileNotFoundError:
            pass
        raise WriterConflict(
            f"lost the expired-lease takeover race on {path} — another "
            "writer claimed this lease generation; retry later"
        )
    with os.fdopen(cfd, "w") as f:
        f.write(payload)
    tmp = lease_path + f".{token}.tmp"
    with open(tmp, "w") as f:
        f.write(payload)
    os.replace(tmp, lease_path)
    os.remove(claim_path)
    return token


def release_writer_lease(path: str, token: str) -> None:
    """Release only YOUR lease (a token mismatch means someone took
    over an expired lease you were holding — releasing theirs would
    reopen the race; raise instead)."""
    import json as _json

    lease_path = os.path.join(path, _LEASE)
    try:
        with open(lease_path) as f:
            held = _json.load(f)
    except (FileNotFoundError, ValueError):
        return
    if held.get("token") != token:
        raise WriterConflict(
            f"lease on {path} is held by a different writer (takeover "
            "after expiry?) — this writer must stop, not release"
        )
    os.remove(lease_path)


class WriterConflict(RuntimeError):
    """A second writer attempted to acquire a live lease."""


def vacuum_tombstones(spark, path: str, low_watermark) -> int:
    """Retention GC for the CDC delete tombstones a stream_merge table
    retains (see stream_merge_to_parquet's op_col contract): rewrite
    the LATEST committed snapshot's ``_tombstones/`` without rows whose
    ``order_col`` value is below ``low_watermark``, swap it in via two
    renames, and return the number dropped.

    The trade is the standard one (Cassandra gc_grace / Delta
    tombstone retention): a tombstone may be dropped only once no
    delta OLDER than it can still arrive — ``low_watermark`` is the
    caller's promise about maximum event lateness. A late row older
    than a VACUUMED tombstone resurrects its key (pinned by test);
    choose the watermark accordingly. Only the committed head is
    rewritten — older versions are already immutable history and their
    tombstones age out with vacuum_versions.
    """
    import json as _json

    with open(os.path.join(path, "_meta.json")) as f:
        meta = _json.load(f)
    order_col = meta.get("order_col")
    if not order_col:
        raise ValueError(
            "tombstone retention applies only to order_col tables "
            "(plain-upsert deletes retain nothing)"
        )
    committed = _read_manifest(path)
    if committed is None:
        raise FileNotFoundError(f"no committed manifest under {path}")
    tomb_dir = os.path.join(path, f"v={committed}", "_tombstones")
    if not os.path.isdir(tomb_dir):
        return 0
    t = spark.read.parquet(tomb_dir)
    keep = t.where(F.col(order_col) >= F.lit(low_watermark))
    dropped = t.count() - keep.count()
    if dropped == 0:
        return 0
    tmp, old = tomb_dir + "__vacuum", tomb_dir + "__old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    keep.write.mode("overwrite").parquet(tmp)
    os.rename(tomb_dir, old)
    os.rename(tmp, tomb_dir)
    shutil.rmtree(old)
    return dropped


def stream_additive_merge_to_parquet(
    sdf: DataFrame,
    path: str,
    keys: list[str],
    count_cols: list[str],
    checkpoint_dir: str | None = None,
) -> str:
    """Streaming maintenance for ADDITIVE sketch state (the per-day
    histogram / daily-counts tables the q112/q113 rollups read): each
    micro-batch's per-key partial sums ADD into the previous snapshot
    — the merge is ``new = old + delta`` per key, not last-write-wins,
    which is why stream_merge_to_parquet's arbitration cannot express
    it. Additivity is what makes the state mergeable at all (histogram
    bins, counts, sums — anything a partial agg emits).

    Same versioned layout + atomic ``_LATEST`` manifest as
    stream_merge_to_parquet (readers never see a torn snapshot), and
    the same replay determinism: v=N is a pure function of v=N-1 and
    batch N, so a replayed batch overwrites v=N with identical
    contents instead of double-adding — THE failure mode an additive
    sink must rule out. Scale shape: the delta aggregates map-side to
    |touched keys| rows; the snapshot outer-joins it on the keys (the
    sketch table is key-space-sized — days×bins — not event-sized).

    Returns the final committed version dir.
    """
    if checkpoint_dir is None:
        checkpoint_dir = os.path.join(path, "_checkpoint")
    os.makedirs(path, exist_ok=True)
    import json as _json

    with open(os.path.join(path, "_meta.json"), "w") as f:
        _json.dump({"keys": list(keys), "count_cols": list(count_cols)}, f)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = batch_df.groupBy(*keys).agg(
            *[F.sum(c).alias(c) for c in count_cols]
        )
        m = _read_manifest(path)
        prev = None
        if m is not None and m < batch_id:
            cand = os.path.join(path, f"v={m}")
            if os.path.isdir(cand):
                prev = cand
        if prev is None:
            for i in range(batch_id - 1, -1, -1):
                cand = os.path.join(path, f"v={i}")
                if os.path.isdir(cand):
                    prev = cand
                    break
        if prev is None:
            merged = delta
        else:
            old = spark.read.parquet(prev)
            o = old.select(*keys, *[F.col(c).alias(f"_o_{c}") for c in count_cols])
            d = delta.select(*keys, *[F.col(c).alias(f"_d_{c}") for c in count_cols])
            merged = o.join(d, keys, "full_outer").select(
                *keys,
                *[
                    (
                        F.coalesce(F.col(f"_o_{c}"), F.lit(0))
                        + F.coalesce(F.col(f"_d_{c}"), F.lit(0))
                    ).alias(c)
                    for c in count_cols
                ],
            )
        ver_dir = os.path.join(path, f"v={batch_id}")
        merged.write.mode("overwrite").parquet(ver_dir)
        _commit_manifest(path, batch_id)

    q = (
        sdf.writeStream.foreachBatch(write_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return latest_version(path)
