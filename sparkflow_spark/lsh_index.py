"""Persistent MinHash-LSH index lifecycle: build / append / query.

The one-shot :func:`dedup.minhash_candidate_pairs` recomputes every
signature per run — right for a batch dedup pass, wrong for the
production shape where a corpus GROWS and each increment must be checked
against everything already indexed. This module persists the index as
parquet — ``buckets/`` (doc_id, band, bucket), partitioned by band, and
``sigs/`` (doc_id, sig) holding each signature ONCE (bucket rows carry
only 8-byte hashes; storing the K-hash signature per band row would be
a bands-fold write/storage amplification) — plus a params sidecar, so:

- **append** computes signatures for the NEW docs only (O(delta)), with
  the stored params — a mismatched-params index is unusable, so params
  ride the index, not the call site;
- **query** joins probe signatures against the bucket table on
  (band, bucket) — partition pruning keeps the scan per-band, the join
  is keyed (never cartesian), and verification re-ranks candidates by
  estimated jaccard from the stored signatures;
- append == rebuild (same params ⇒ signatures are pure functions of
  text), pinned by tests — the invariant that makes incremental
  maintenance trustworthy.

At 100 TB the bucket table is the only persistent state (K·bands small
rows per doc); no signature is ever recomputed for old docs.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from sparkflow_spark.dedup import minhash_md5_signatures, minhash_signatures

_PARAMS_FILE = "_lsh_params.json"


def _signatures(df: DataFrame, p: dict) -> DataFrame:
    """(id, sig) under the index's hash family. ``xxhash64`` (default)
    is the fast JVM family (array<long> signatures); ``md5`` is the
    engine-PORTABLE family (array<string> hex digests — bit-identical
    in every engine, so the whole index lifecycle is replayable
    hash-for-hash outside Spark; the d_lsh_index_md5_query oracle does
    exactly that). The family is an INDEX property (stored in params):
    signatures from different families never mix."""
    fam = p.get("hash_family", "xxhash64")
    if fam == "xxhash64":
        return minhash_signatures(
            df, p["text_col"], p["id_col"], p["num_hashes"], p["shingle_k"], p["seed"]
        )
    if fam == "md5":
        wide = minhash_md5_signatures(
            df,
            text_col=p["text_col"],
            id_col=p["id_col"],
            num_hashes=p["num_hashes"],
            shingle_k=p["shingle_k"],
        )
        return wide.select(
            F.col(p["id_col"]),
            F.array(*[F.col(f"h{i}") for i in range(p["num_hashes"])]).alias("sig"),
        )
    raise ValueError(f"unknown hash_family {fam!r} (expected 'xxhash64' or 'md5')")


def _banded(
    sigs: DataFrame,
    num_hashes: int,
    bands: int,
    id_col: str,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(id, sig, band, bucket) — one row per (doc, band); bucket keys
    the band's signature slice. xxhash64 family: 64-bit hash of the
    comma-joined slice (same keying as dedup.minhash_candidate_pairs).
    md5 family: md5 of the joined slice — portable, and injective over
    fixed-width digests, so band-equality decisions match any engine
    concatenating the same digests."""
    rows_per_band = num_hashes // bands
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))

    def bucket_of(b):
        joined = F.concat_ws(
            ",",
            F.transform(
                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                lambda v: v.cast("string"),
            ),
        )
        return F.md5(joined) if hash_family == "md5" else F.xxhash64(joined)

    return sigs.select(
        F.col(id_col),
        F.col("sig"),
        F.explode(
            F.transform(
                band_idx,
                lambda b: F.struct(b.alias("band"), bucket_of(b).alias("bucket")),
            )
        ).alias("bb"),
    ).select(id_col, "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def build_lsh_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 42,
    hash_family: str = "xxhash64",
) -> None:
    """Create the index: banded buckets partitioned by band + params
    sidecar. Overwrites an existing index at ``path``.

    ``hash_family``: ``xxhash64`` (default, fast JVM family) or ``md5``
    (engine-portable — every signature and bucket is reproducible
    outside Spark; ~3x slower signing). The family is stored in params
    and applies to every later append/query on this index."""
    if bands < 1 or bands > num_hashes or num_hashes % bands != 0:
        # rows_per_band = num_hashes // bands would silently drop tail
        # hashes (recall loss) or, for bands > num_hashes, hash an EMPTY
        # slice so every doc lands in one bucket — a de-facto cross join
        # at query time
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes}) exactly"
        )
    params = {
        "text_col": text_col,
        "id_col": id_col,
        "num_hashes": num_hashes,
        "bands": bands,
        "shingle_k": shingle_k,
        "seed": seed,
        "hash_family": hash_family,
    }
    from sparkflow_spark.catalog import fan_out, write_partitions

    # parallelize signing (a one-row-group scan otherwise runs the
    # md5/xxhash explode map-side in ONE task) and size the output
    # files from optimizer stats (guide §6) — both no-ops at scale
    sigs = _signatures(fan_out(df), params)
    n_out = write_partitions(sigs)
    if n_out is not None:
        # repartition AFTER signing: keeps the signing parallel, lands
        # sigs/ in ~64 MB files instead of one per shuffle partition
        sigs = sigs.repartition(n_out)
    # the signature pandas stage feeds two writers; materialize once.
    # WRITE ORDER CONTRACT (here and in append_to_lsh_index): sigs/
    # BEFORE buckets/. The two writes are separate jobs, not a
    # transaction — a failure between them must leave the index
    # QUERY-CONSISTENT. query_lsh_index inner-joins bucket candidates
    # against sigs/ on match_id, so a stored signature with no bucket
    # rows is merely unreachable (repair with reconcile_lsh_index —
    # NEVER by re-running the append: sigs/ is written in append mode,
    # so a re-run would store a SECOND copy of the delta's signature
    # rows), while a bucket row with no signature would be SILENTLY
    # DROPPED from every candidate list — permanent recall loss.
    # Writing sigs first makes the failure mode the recoverable one.
    sigs = sigs.localCheckpoint(eager=False)
    out = _banded(sigs, num_hashes, bands, id_col, hash_family).drop("sig")
    if n_out is not None:
        # (band, bucket) keys spread band data over n_out tasks; the
        # partitionBy writer then lands ~n_out files per band dir
        # instead of one per shuffle partition. r14: at n_out == 1 that
        # funneled ALL bands through ONE task writing `bands` files
        # sequentially — repartitioning by band writes the IDENTICAL
        # one-file-per-band layout with band-parallel tasks instead.
        out = (
            out.repartition(bands, "band")
            if n_out == 1
            else out.repartition(n_out, "band", "bucket")
        )
    sigs.write.mode("overwrite").parquet(os.path.join(path, "sigs"))
    out.write.mode("overwrite").partitionBy("band").parquet(os.path.join(path, "buckets"))
    with open(os.path.join(path, _PARAMS_FILE), "w") as f:
        json.dump(params, f)


def load_params(path: str) -> dict:
    with open(os.path.join(path, _PARAMS_FILE)) as f:
        return json.load(f)


_TOMBSTONES = "tombstones"


def delete_from_lsh_index(spark: SparkSession, path: str, ids: DataFrame) -> None:
    """Takedown support: tombstone doc ids (one O(delta) parquet append
    beside the index — sigs/ and buckets/ are NOT rewritten). Queries
    exclude tombstoned docs immediately; :func:`compact_lsh_index`
    folds tombstones in, physically removing the rows and clearing the
    tombstone table. Idempotent: deleting an id twice (or an id the
    index never held) is a no-op at query time. This is the takedown
    story a real LLM corpus pipeline needs — before this the only
    answer to "remove this document" was a full index rebuild."""
    p = load_params(path)
    ids.select(p["id_col"]).distinct().write.mode("append").parquet(
        os.path.join(path, _TOMBSTONES)
    )


def _tombstone_data_files(path: str) -> list[str]:
    """The tombstone table's visible data files right now (hidden
    ``_``/``.``-prefixed entries and in-flight ``_temporary/`` subdirs
    excluded). Compaction/vacuum snapshot THIS list so their final
    cleanup deletes exactly the files whose rows were folded into the
    rewrite — a delete appended after the snapshot keeps its files and
    stays live instead of being silently discarded (resurrecting a
    taken-down doc, the worst failure for a takedown path)."""
    tpath = os.path.join(path, _TOMBSTONES)
    if not os.path.isdir(tpath):
        return []
    return sorted(
        os.path.join(tpath, f)
        for f in os.listdir(tpath)
        if not f.startswith(("_", ".")) and os.path.isfile(os.path.join(tpath, f))
    )


def _clear_tombstone_files(path: str, snapshot_files: list[str]) -> None:
    """Delete exactly ``snapshot_files`` (plus their checksum siblings),
    then best-effort remove the directory ONLY if no newer data files
    landed meanwhile — ``os.rmdir`` refuses a non-empty dir, so a
    concurrent append can never be swept away."""
    tpath = os.path.join(path, _TOMBSTONES)
    for f in snapshot_files:
        crc = os.path.join(os.path.dirname(f), "." + os.path.basename(f) + ".crc")
        for target in (f, crc):
            try:
                os.remove(target)
            except FileNotFoundError:
                pass
    if not _tombstone_data_files(path):
        for extra in ("_SUCCESS", "._SUCCESS.crc"):
            try:
                os.remove(os.path.join(tpath, extra))
            except FileNotFoundError:
                pass
        try:
            os.rmdir(tpath)
        except OSError:
            pass  # a concurrent append landed — its tombstones stay live


def _live_tombstones(spark: SparkSession, path: str, id_col: str) -> DataFrame | None:
    """The distinct tombstoned ids, or None when none exist. Takedown
    tables are tiny (human-scale removal requests), so callers
    broadcast the anti-join."""
    files = _tombstone_data_files(path)
    if not files:
        return None
    return spark.read.parquet(*files).select(id_col).distinct()


def append_to_lsh_index(spark: SparkSession, path: str, new_df: DataFrame) -> None:
    """Index the NEW docs only (O(delta) signature work) using the
    STORED params; appends to the bucket table. Caller guarantees new
    ids are disjoint from indexed ids (enforce upstream with
    operators.merge_upsert semantics if re-indexing changed docs).

    Partial-append failure mode (two non-atomic jobs): sigs/ is written
    FIRST — see the write-order contract in build_lsh_index. A crash
    between the writes leaves orphan signatures (unreachable until
    repaired), never bucket rows whose candidates would silently drop
    from query joins. Repair ONLY with ``reconcile_lsh_index``, which
    appends exactly the missing bucket rows (a pure function of the
    stored signature). Do NOT re-run the append: sigs/ is append-mode,
    so a re-run stores a second copy of the delta's signatures —
    doubled storage and duplicated candidate rows for those ids."""
    p = load_params(path)
    from sparkflow_spark.catalog import fan_out, write_partitions

    sigs = _signatures(fan_out(new_df), p)
    n_out = write_partitions(sigs)
    if n_out is not None:
        sigs = sigs.repartition(n_out)
    sigs = sigs.localCheckpoint(eager=False)
    out = _banded(
        sigs, p["num_hashes"], p["bands"], p["id_col"], p.get("hash_family", "xxhash64")
    ).drop("sig")
    if n_out is not None:
        # band-parallel write at n_out == 1 — same layout, see build
        out = (
            out.repartition(p["bands"], "band")
            if n_out == 1
            else out.repartition(n_out, "band", "bucket")
        )
    sigs.write.mode("append").parquet(os.path.join(path, "sigs"))
    out.write.mode("append").partitionBy("band").parquet(os.path.join(path, "buckets"))


def reconcile_lsh_index(spark: SparkSession, path: str) -> int:
    """Repair an index left inconsistent by a crash between the two
    append jobs: find stored signatures with no bucket rows (the only
    inconsistency the sigs-first write order permits) and re-derive
    their bucket rows. Returns the number of orphan docs repaired.
    O(index) scan of ids — an offline maintenance pass, not a hot-path
    operator; the banding is recomputed from the stored signature, so
    repair needs no access to the original text."""
    p = load_params(path)
    sigs = spark.read.parquet(os.path.join(path, "sigs"))
    buckets = spark.read.parquet(os.path.join(path, "buckets"))
    orphans = sigs.join(
        buckets.select(p["id_col"]).distinct(), on=p["id_col"], how="left_anti"
    )
    n = orphans.count()
    if n:
        out = _banded(
            orphans,
            p["num_hashes"],
            p["bands"],
            p["id_col"],
            p.get("hash_family", "xxhash64"),
        ).drop("sig")
        out.write.mode("append").partitionBy("band").parquet(
            os.path.join(path, "buckets")
        )
    return n


def query_lsh_index(
    spark: SparkSession,
    path: str,
    probes: DataFrame,
    min_est_jaccard: float = 0.5,
) -> DataFrame:
    """Find indexed near-duplicates of ``probes`` → (probe_id, match_id,
    est_jaccard): probe docs are signed with the stored params, joined
    to the bucket table on (band, bucket), candidates deduped and
    re-ranked by the fraction of matching minhashes from the STORED
    signatures (no text ever leaves the probe side)."""
    p = load_params(path)
    idx = spark.read.parquet(os.path.join(path, "buckets"))
    stored = (
        spark.read.parquet(os.path.join(path, "sigs"))
        .select(F.col(p["id_col"]).alias("match_id"), F.col("sig").alias("match_sig"))
        # Defense in depth against an index whose append was wrongly
        # re-run after a crash (duplicate signature rows for the delta
        # ids): signatures are a deterministic function of (text,
        # params), so duplicates are byte-identical and keeping either
        # is exact — without this, the candidate join would fan out to
        # duplicated (probe_id, match_id) result rows.
        .dropDuplicates(["match_id"])
    )
    # takedown filter: tombstoned docs never surface as matches. The
    # candidate join inner-joins `stored`, so filtering the signature
    # side alone excludes them everywhere; one broadcast anti-join
    # against the (tiny) takedown table.
    tomb = _live_tombstones(spark, path, p["id_col"])
    if tomb is not None:
        stored = stored.join(
            F.broadcast(tomb.withColumnRenamed(p["id_col"], "match_id")),
            on="match_id",
            how="left_anti",
        )
    psigs = _signatures(probes, p)
    pb = _banded(
        psigs, p["num_hashes"], p["bands"], p["id_col"], p.get("hash_family", "xxhash64")
    ).select(
        F.col(p["id_col"]).alias("probe_id"),
        F.col("sig").alias("probe_sig"),
        "band",
        "bucket",
    )
    cand = (
        pb.join(idx, on=["band", "bucket"])
        .filter(F.col("probe_id") != F.col(p["id_col"]))
        .select("probe_id", F.col(p["id_col"]).alias("match_id"), "probe_sig")
        .dropDuplicates(["probe_id", "match_id"])
        .join(stored, on="match_id")
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("probe_sig", "match_sig", lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        / F.lit(float(p["num_hashes"]))
    ).alias("est_jaccard")
    return cand.select("probe_id", "match_id", est).filter(
        F.col("est_jaccard") >= min_est_jaccard
    )


def compact_lsh_index(
    spark: SparkSession, path: str, target_rows_per_file: int = 1_000_000
) -> dict:
    """Offline small-files maintenance for an appended index.

    Every ``append_to_lsh_index`` call adds one file to sigs/ and one
    per touched band dir — O(appends) files. Sub-``openCostInBytes``
    files defeat Spark's file packing (maxSplitBytes floors at the
    open cost, so each tiny file becomes its own scan task — the exact
    failure measured on the IVF cells table, SCALE.md round-7h), so an
    index that takes thousands of small deltas eventually pays a
    per-file task tax on EVERY query. This rewrites sigs/ into
    ⌈rows/target⌉ files and buckets/ into ~⌈band_rows/target⌉ files
    per band dir (repartitioned on (band, id-hash slice) so the band
    partitioning survives), then swaps each rewrite in via two
    renames.

    Single-writer maintenance op, same contract as
    ``reconcile_lsh_index``. Crash safety: a crash before a swap
    leaves the live index untouched (the __compact dir is simply
    re-overwritten next run); a crash BETWEEN the two renames leaves
    the live dir absent — queries fail LOUDLY (never silently wrong)
    and the repair is renaming the __old dir back. Local/posix rename
    semantics; on object stores run it as a copy-then-repoint job.
    Content equality under compaction is the order-independent
    invariant pinned in tests/test_lsh_index.py.
    """
    import shutil

    p = load_params(path)
    out: dict = {}
    # fold tombstones in: the compaction rewrite is the moment physical
    # removal is free (every row is being rewritten anyway). The
    # tombstone table is cleared only AFTER both swaps land — a crash
    # in between leaves tombstones in place, and the query-time filter
    # keeps excluding the ids (idempotent re-compaction removes them
    # physically next run).
    tomb_files = _tombstone_data_files(path)
    tomb = None
    if tomb_files:
        tomb = F.broadcast(
            spark.read.parquet(*tomb_files)
            .select(p["id_col"])
            .distinct()
            .localCheckpoint()
        )
        out["tombstoned_ids"] = tomb.count()
    for sub, banded in (("sigs", False), ("buckets", True)):
        src = os.path.join(path, sub)
        tmp, old = src + "__compact", src + "__old"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        df = spark.read.parquet(src)
        out[f"{sub}_files_before"] = len(df.inputFiles())
        if tomb is not None:
            df = df.join(tomb, on=p["id_col"], how="left_anti")
        n = df.count()
        if banded:
            per_band = max(1, -(-n // p["bands"] // target_rows_per_file))
            rep = df.repartition(
                p["bands"] * per_band,
                F.col("band"),
                F.pmod(F.hash(F.col(p["id_col"])), F.lit(per_band)),
            )
            rep.write.mode("overwrite").partitionBy("band").parquet(tmp)
        else:
            n_files = max(1, -(-n // target_rows_per_file))
            df.repartition(n_files).write.mode("overwrite").parquet(tmp)
        os.rename(src, old)
        os.rename(tmp, src)
        shutil.rmtree(old)
        out[f"{sub}_files_after"] = len(spark.read.parquet(src).inputFiles())
    if tomb is not None:
        # both swaps committed: the SNAPSHOTTED tombstone files are
        # spent — delete only those; a delete_from_lsh_index append that
        # landed after the snapshot read keeps its files and stays live
        # for the query-time filter (and the next compaction).
        _clear_tombstone_files(path, tomb_files)
    return out
