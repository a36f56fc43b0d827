"""Round-13 behavioral pins.

Covers the r12 ADVICE fixes (truncated-WAV NULL rows, sfl legacy
epoch-key replay detection), the mm_feature_extract
driver-canonicalizer-safe output form, and the round's new operators.
"""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# r12 ADVICE #1: truncated 16-bit PCM blobs must yield NULL rows, not a
# struct.error that kills the mapInPandas task


def _wav_bytes(samples, nch=1, rate=8000):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(nch)
    w.setsampwidth(2)
    w.setframerate(rate)
    w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    w.close()
    return buf.getvalue()


def test_truncated_wav_yields_null_row_not_task_failure(spark):
    """A WAV whose data chunk is cut mid-sample (odd byte count — the
    header promises more frames than the blob holds) previously raised
    struct.error OUTSIDE the decoder's try/except and failed the whole
    task; the contract is a NULL stats row with the pipeline flowing."""
    from sparkflow_spark import multimodal

    good = _wav_bytes([100, -100, 200, -200])
    # chop one byte: the data chunk now ends mid-sample (odd length)
    odd_truncated = good[:-1]
    # chop a whole sample: even length but short of the header's count
    short_even = good[:-2]
    assert multimodal.decode_wav_bytes(odd_truncated) is None
    assert multimodal.decode_wav_bytes(short_even) is None
    assert multimodal.decode_wav_bytes(good) is not None

    rows = [(0, good), (1, odd_truncated), (2, short_even)]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r["doc_id"]: r for r in multimodal.decode_audio(df).collect()}
    assert len(got) == 3  # every blob produced a row — no dead task
    assert got[0]["sum_sq"] == sum(s * s for s in [100, -100, 200, -200])
    for bad in (1, 2):
        assert got[bad]["n_channels"] is None
        assert got[bad]["sum_sq"] is None and got[bad]["peak"] is None


# ---------------------------------------------------------------------------
# r12 ADVICE #2: sfl stream-writer manifests written BEFORE epochs were
# keyed per checkpoint hold bare str(batchId) keys — a post-upgrade
# replay of such an epoch must still be detected (no double-append)


def test_sfl_stream_writer_detects_legacy_bare_batchid_epochs(tmp_path):
    from pyspark.sql.types import LongType, StructField, StructType

    from sparkflow_spark.sources_python import (
        SflStreamWriter,
        _SflCommit,
        _manifest_path,
        _read_manifest,
    )

    sink = str(tmp_path / "sink")
    os.makedirs(sink)
    # a manifest as the PRE-upgrade code wrote it: epoch keyed by bare
    # batchId, one committed shard
    legacy = {
        "schema": "id bigint",
        "shards": [{"file": "shard-legacy.sfl", "rows": 2}],
        "epochs": {"7": ["shard-legacy.sfl"]},
    }
    with open(_manifest_path(sink), "w") as fh:
        json.dump(legacy, fh)
    with open(os.path.join(sink, "shard-legacy.sfl"), "w") as fh:
        fh.write("1\n2\n")

    schema = StructType([StructField("id", LongType())])
    writer = SflStreamWriter(sink, schema, query_key="ck-after-upgrade")
    # the replayed epoch's duplicate task output, already on disk
    dup = os.path.join(sink, "shard-dup.sfl")
    with open(dup, "w") as fh:
        fh.write("1\n2\n")
    writer.commit([_SflCommit("shard-dup.sfl", 2)], batchId=7)

    m = _read_manifest(sink)
    # replay detected via the legacy key: manifest unchanged, duplicate
    # shard discarded from disk
    assert [s["file"] for s in m["shards"]] == ["shard-legacy.sfl"]
    assert set(m["epochs"]) == {"7"}
    assert not os.path.exists(dup)

    # a genuinely NEW epoch still appends under the per-checkpoint key
    new = os.path.join(sink, "shard-new.sfl")
    with open(new, "w") as fh:
        fh.write("3\n")
    writer.commit([_SflCommit("shard-new.sfl", 1)], batchId=8)
    m = _read_manifest(sink)
    assert [s["file"] for s in m["shards"]] == ["shard-legacy.sfl", "shard-new.sfl"]
    assert set(m["epochs"]) == {"7", "ck-after-upgrade:8"}


# ---------------------------------------------------------------------------
# r12 verdict ask #2: mm_feature_extract's registered output must be
# driver-canonicalizer-safe (no ArrayType final column)


def test_mm_feature_extract_output_is_canonicalizer_safe(spark, sf_dir):
    from sparkflow_spark.queries import load_all

    df = load_all()["mm_feature_extract"].fn(spark, sf_dir)
    kinds = {f.name: f.dataType.typeName() for f in df.schema.fields}
    assert kinds == {"doc_id": "long", "features_csv": "string"}
    # the driver's canonicalization path (pandas sort + hash) must work
    pdf = df.limit(8).toPandas()
    canon = pdf[sorted(pdf.columns)].astype(str)
    canon.sort_values(by=list(canon.columns)).reset_index(drop=True)
    # and the CSV form is lossless back to the 8-dim vector
    vec = [float(x) for x in pdf["features_csv"].iloc[0].split(",")]
    assert len(vec) == 8 and abs(sum(vec) - 1.0) < 1e-9
