"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Convention (north-star brief): a modality column is

    struct<content: binary, mime: string, meta: map<string,string>>

- Binary payloads stay opaque to Catalyst (predicate pushdown happens on
  the metadata columns, which is why meta is *columnar*, not baked into
  the blob).
- Decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` with explicit schemas — the only sane shape at 100 TB:
  batches of blobs arrive at the Python worker without row-pickling, and
  the work parallelizes per partition with zero shuffle.
- The container has no image/audio libraries, so the actual codecs are
  STUBBED: ``decode_image`` raises NotImplementedError unless PIL is
  importable; ``extract_features`` / ``sample_frames`` use clearly-marked
  deterministic fakes (byte histograms / chunk hashes) so the Spark-side
  plumbing — schema, batching, partitioning — is real and testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

N_FEATURES = 8

MODALITY_TYPE = T.StructType(
    [
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text", mime: str = "text/plain") -> DataFrame:
    """Fixture adapter: wrap a text column as a modality struct (the
    fixtures ship no real blobs; payload = UTF-8 bytes of the text)."""
    return df.withColumn(
        "media",
        F.struct(
            F.encode(F.col(text_col), "UTF-8").alias("content"),
            F.lit(mime).alias("mime"),
            F.create_map(
                F.lit("n_chars"), F.length(text_col).cast("string"),
            ).alias("meta"),
        ),
    )


def binary_stats(df: DataFrame, content_col: str = "media.content") -> DataFrame:
    """Pure-Catalyst blob stats: size + sha256 — dedup/integrity keys for
    binary corpora (no Python involved)."""
    return df.withColumn("n_bytes", F.octet_length(F.col(content_col)).cast("bigint")).withColumn(
        "content_sha", F.sha2(F.col(content_col), 256)
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def extract_features(df: DataFrame, id_col: str = "doc_id", content_col: str = "content") -> DataFrame:
    """DETERMINISTIC-FAKE featurizer over binary payloads via mapInPandas.

    Real systems put the image/audio model here (ONNX/torch per-worker,
    batched); the fake is an L1-normalized 8-bin byte histogram —
    deterministic, so tests can oracle it with numpy. The Spark shape
    (Arrow batches in, declared schema out, no shuffle) is the real
    thing.
    """
    flat = df.select(F.col(id_col).cast("long").alias("doc_id"), F.col(content_col).alias("content"))

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob in pdf["content"]:
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                hist = np.bincount(arr >> 5, minlength=N_FEATURES).astype(np.float64)
                total = hist.sum()
                feats.append(list(hist / total if total else hist))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return flat.mapInPandas(featurize, schema=FEATURE_SCHEMA)


def fake_featurize_bytes(blob: bytes) -> list[float]:
    """numpy oracle twin of the fake featurizer (for tests)."""
    arr = np.frombuffer(blob, dtype=np.uint8)
    hist = np.bincount(arr >> 5, minlength=N_FEATURES).astype(np.float64)
    total = hist.sum()
    return list(hist / total if total else hist)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sha", T.StringType()),
    ]
)


def sample_frames(
    df: DataFrame, n_frames: int = 4, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """DETERMINISTIC-FAKE video frame sampler: uniformly sample
    ``n_frames`` byte-chunks from the blob and fingerprint each (stands
    in for keyframe extraction; same fan-out row shape: one row per
    sampled frame)."""
    flat = df.select(F.col(id_col).cast("long").alias("doc_id"), F.col(content_col).alias("content"))

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_sha": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(blob)
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    chunk = b[i * step : (i + 1) * step]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_sha"].append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(out)

    return flat.mapInPandas(sample, schema=FRAME_SCHEMA)


IMAGE_SCHEMA = "doc_id long, width int, height int, mode string, pixels array<float>"


def decode_image(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Real image decode via Pillow → (doc_id, width, height, mode,
    pixels) with pixels scaled to [0, 1] float32, row-major, channel-
    interleaved. Undecodable blobs yield a row with NULL width/height/
    mode/pixels (pipeline keeps flowing; callers filter on
    ``width IS NOT NULL``).

    Spark shape: one Arrow-batched ``mapInPandas`` stage over the binary
    column with a declared schema — identical plumbing to
    :func:`extract_features` / :func:`sample_frames`, which keep this
    path's partitioning/batching behavior tested in environments (like
    this build sandbox) that ship no imaging libraries. There the
    import guard below fails LOUDLY at plan-construction time instead
    of faking a decode.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "decode_image requires Pillow, which this environment does not ship; "
            "the Spark plumbing (mapInPandas over binary, declared schema) is "
            "exercised via extract_features/sample_frames instead"
        ) from exc

    flat = df.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(content_col).alias("content")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import PIL.Image as Image

        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "mode": [], "pixels": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                out["doc_id"].append(doc_id)
                try:
                    img = Image.open(io.BytesIO(bytes(blob)))
                    arr = np.asarray(img, dtype=np.float32) / 255.0
                    out["width"].append(img.width)
                    out["height"].append(img.height)
                    out["mode"].append(img.mode)
                    out["pixels"].append(arr.ravel())
                except Exception:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["mode"].append(None)
                    out["pixels"].append(None)
            yield pd.DataFrame(out)

    return flat.mapInPandas(decode, schema=IMAGE_SCHEMA)
