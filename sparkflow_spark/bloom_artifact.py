"""Versioned persistence for bloom-filter bitmaps — the build-once side
of ``operators.build_bloom_filter`` / ``bloom_ingest_membership`` made a
real artifact instead of a per-call rebuild.

Why it exists (r7 verdict "missing #3"): at production cadence the
corpus-side bloom is built ONCE per corpus version (one full scan) and
every ingest batch after that pays only probe+verify; without a
save/load API the registered query rebuilt the bitmap per call. This
module gives the bitmap the same lifecycle the IVF centroids
(vector_index.py) and LSH layout (lsh_index.py) already have.

Layout under ``path/`` (the stream_merge single-pointer commit shape —
see streaming/sinks.py):

    v=<N>/bloom.bin     raw bitmap bytes (n_bits/8)
    v=<N>/_meta.json    {"on", "n_bits", "k", "corpus_version", ...}
    _LATEST             atomic manifest: highest COMMITTED version

Write order is bitmap → meta → manifest rename, so a reader can never
observe a torn artifact: until the ``_LATEST`` rename lands, the new
version does not exist for readers. Versions strictly increase and old
versions stay readable — the STALENESS CONTRACT a bloom artifact
supports: a bitmap built at corpus version V has no false negatives for
any key present at V (bloom property), and corpus APPENDS only add
keys, so an old bitmap may miss new keys but never lies about old ones.
A consumer holding v=N while v=N+1 publishes keeps exact results for
the v=N corpus; refresh = load latest.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_LATEST = "_LATEST"
_BITMAP = "bloom.bin"
_META = "_meta.json"


def _read_latest(path: str) -> int | None:
    try:
        with open(os.path.join(path, _LATEST)) as f:
            return int(json.load(f)["version"])
    except (FileNotFoundError, ValueError, KeyError):
        return None


def latest_bloom_version(path: str) -> int | None:
    """Highest COMMITTED version (None for an empty/absent artifact).
    Torn/unpublished ``v=N`` directories are invisible by design."""
    return _read_latest(path)


def file_stats_fingerprint(*paths: str) -> str:
    """Cheap corpus-generation token from file METADATA only (no data
    scan): file count + total bytes + latest mtime over the given
    files/dirs. A regenerated corpus under the same logical name gets a
    different token, so :func:`ensure_bloom` detects the persisted
    bitmap as stale and rebuilds instead of silently probing an old
    bitmap — bloom false negatives (rows wrongly dropped) are the one
    failure the bloom contract forbids."""
    n = 0
    total = 0
    mtime = 0
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                for fn in files:
                    st = os.stat(os.path.join(root, fn))
                    n += 1
                    total += st.st_size
                    mtime = max(mtime, st.st_mtime_ns)
        else:
            st = os.stat(p)
            n += 1
            total += st.st_size
            mtime = max(mtime, st.st_mtime_ns)
    return f"{n}:{total}:{mtime}"


def save_bloom(
    path: str,
    bloom: bytes,
    *,
    on: str,
    k: int,
    corpus_version: str | int | None = None,
    corpus_fingerprint: str | None = None,
) -> int:
    """Persist a bitmap as the next committed version; returns it.

    ``on``/``k`` are probe-side parameters (the probe must hash the same
    column rendering with the same k seeds — a mismatched probe is a
    correctness bug, not a tuning knob), so they travel WITH the bitmap.
    ``corpus_version`` is the caller's label for the corpus state the
    bitmap covers (a snapshot version, a date, a row count).
    """
    if not bloom or len(bloom) % 8:
        raise ValueError("bloom must be non-empty bytes, multiple of 8")
    latest = _read_latest(path)
    version = 0 if latest is None else latest + 1
    vdir = os.path.join(path, f"v={version}")
    os.makedirs(vdir, exist_ok=True)
    with open(os.path.join(vdir, _BITMAP), "wb") as f:
        f.write(bloom)
    meta = {
        "on": on,
        "n_bits": len(bloom) * 8,
        "k": int(k),
        "corpus_version": corpus_version,
        "corpus_fingerprint": corpus_fingerprint,
    }
    with open(os.path.join(vdir, _META), "w") as f:
        json.dump(meta, f)
    # commit point: readers see the version only after this rename
    tmp = os.path.join(path, f"{_LATEST}.v{version}.tmp")
    with open(tmp, "w") as f:
        json.dump({"version": version}, f)
    os.replace(tmp, os.path.join(path, _LATEST))
    return version


def load_bloom(path: str, version: int | None = None) -> tuple[bytes, dict]:
    """(bitmap, meta) at ``version`` (default: latest committed). Only
    committed versions are addressable — same rule as read_snapshot."""
    committed = _read_latest(path)
    if committed is None:
        raise FileNotFoundError(f"no committed bloom artifact under {path}")
    if version is None:
        version = committed
    if version > committed:
        raise ValueError(
            f"version={version} is beyond the committed manifest "
            f"({committed}) — uncommitted artifacts are not readable"
        )
    vdir = os.path.join(path, f"v={version}")
    with open(os.path.join(vdir, _META)) as f:
        meta = json.load(f)
    with open(os.path.join(vdir, _BITMAP), "rb") as f:
        bloom = f.read()
    if len(bloom) * 8 != meta["n_bits"]:
        raise OSError(
            f"bloom artifact v={version} is corrupt: bitmap carries "
            f"{len(bloom) * 8} bits, meta declares {meta['n_bits']}"
        )
    return bloom, meta


def ensure_bloom(
    spark: SparkSession,
    corpus_keys: DataFrame,
    path: str,
    on: str,
    n_bits: int = 1 << 23,
    k: int = 5,
    corpus_version: str | int | None = None,
    corpus_fingerprint: str | None = None,
) -> tuple[bytes, dict]:
    """Load the latest committed bitmap, or build-and-save v=0 on
    absence (rebuild-on-absence: the production read path). A loaded
    artifact whose ``on``/``n_bits``/``k`` disagree with the request
    raises — silently probing with mismatched parameters would produce
    false negatives, which the bloom contract forbids.

    ``corpus_fingerprint`` (see :func:`file_stats_fingerprint`) is the
    staleness check: when given and it differs from the stored one, the
    corpus was REGENERATED (not appended) under the same path, the old
    bitmap's no-false-negative promise is void, and the bitmap is
    rebuilt and committed as the next version — never probed."""
    if _read_latest(path) is not None:
        bloom, meta = load_bloom(path)
        if meta["on"] != on or meta["n_bits"] != int(n_bits) or meta["k"] != int(k):
            raise ValueError(
                f"bloom artifact at {path} was built with "
                f"(on={meta['on']!r}, n_bits={meta['n_bits']}, k={meta['k']}); "
                f"requested (on={on!r}, n_bits={int(n_bits)}, k={int(k)}) — "
                "probe parameters must match the build or membership is wrong"
            )
        if (
            corpus_fingerprint is None
            or meta.get("corpus_fingerprint") == corpus_fingerprint
        ):
            return bloom, meta
        # fall through: stale bitmap — rebuild below as the next version
    from sparkflow_spark.operators import build_bloom_filter

    bloom = build_bloom_filter(corpus_keys, on, n_bits=n_bits, k=k)
    save_bloom(
        path,
        bloom,
        on=on,
        k=k,
        corpus_version=corpus_version,
        corpus_fingerprint=corpus_fingerprint,
    )
    return load_bloom(path)


def append_to_bloom(
    spark: SparkSession,
    new_keys: DataFrame,
    path: str,
) -> int:
    """Incremental bloom maintenance: OR the NEW keys' bits into the
    latest committed bitmap and commit the union as the next version —
    O(delta) scan instead of the full corpus rescan ``ensure_bloom``'s
    rebuild pays. Exact for corpus APPENDS (bloom union == bloom of the
    union; bits only turn on), which is the only mutation a bloom can
    absorb — deletions need a rebuild (bits cannot turn off). Returns
    the new version."""
    import numpy as np

    from sparkflow_spark.operators import build_bloom_filter

    bloom, meta = load_bloom(path)
    delta = build_bloom_filter(
        new_keys, meta["on"], n_bits=meta["n_bits"], k=meta["k"]
    )
    merged = (
        np.frombuffer(bloom, dtype=np.uint8) | np.frombuffer(delta, dtype=np.uint8)
    ).tobytes()
    return save_bloom(
        path,
        merged,
        on=meta["on"],
        k=meta["k"],
        corpus_version=f"{meta.get('corpus_version')}+delta",
    )
