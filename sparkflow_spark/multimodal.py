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
- ``decode_image`` decodes FOR REAL even without imaging libraries:
  Pillow when importable (production, every format), else dependency-free
  pure-python PPM/PGM + 24-bit-BMP codecs that match PIL bit-for-bit on
  those formats; anything else yields NULL rows. ``extract_features`` /
  ``sample_frames`` use clearly-marked deterministic fakes (byte
  histograms / chunk hashes) so the Spark-side plumbing — schema,
  batching, partitioning — is real and testable for arbitrary bytes.
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

# dHash raster geometry: 9 px wide x 8 px tall grayscale -> 8 adjacent-
# pixel comparisons per row x 8 rows = 64 bits (the standard perceptual
# difference-hash layout).
DHASH_W, DHASH_H = 9, 8


def dhash_expr(pixels_col: str = "pixels") -> F.Column:
    """64-bit perceptual difference hash (dHash) as a '0'/'1' bitstring
    Column over a decoded ``DHASH_W x DHASH_H`` grayscale pixel array
    (row-major, [0,1] floats — :func:`decode_image` output).

    Bit ``k`` (k = y*8 + x) is 1 iff pixel(y, x) > pixel(y, x+1): the
    hash captures the horizontal gradient SIGN pattern, so it is exactly
    invariant under any strictly-monotone brightness remap (uniform
    brightness/contrast shifts that don't clip) and flips bits only
    where the local gradient order changes. Pure Catalyst — 64 codegen'd
    comparisons, no Python; emitted as a bitstring (not a bigint) so the
    value is sign-free and engine-portable for cross-engine hashing.
    """
    bits = []
    for y in range(DHASH_H):
        for x in range(DHASH_W - 1):
            p = F.element_at(pixels_col, y * DHASH_W + x + 1)
            q = F.element_at(pixels_col, y * DHASH_W + x + 2)
            bits.append(F.when(p > q, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def dhash_reference(raster: bytes) -> str:
    """Python oracle twin of :func:`dhash_expr` over raw raster bytes
    (for tests)."""
    assert len(raster) >= DHASH_W * DHASH_H
    out = []
    for y in range(DHASH_H):
        for x in range(DHASH_W - 1):
            out.append(
                "1" if raster[y * DHASH_W + x] > raster[y * DHASH_W + x + 1] else "0"
            )
    return "".join(out)


def dhash_near_pairs(
    hashes: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
    max_hamming: int = 3,
) -> DataFrame:
    """LOSSLESS banded hamming join over 64-bit dHash bitstrings:
    (id_a, id_b, hamming) for every pair within ``max_hamming``.

    Pigeonhole: split the 64 bits into ``max_hamming + 1`` bands — two
    hashes within hamming distance d differ in at most d bands, so at
    least one band is EQUAL. Candidates come from a (band_idx,
    band_val) equi-join (never all-pairs — the same shuffle shape as
    the MinHash-LSH banded join, so at 100 TB candidates scale with
    band-bucket occupancy, not n^2), then the exact hamming distance is
    verified via base-2 -> bigint conversion + bit_count(XOR) on two
    32-bit halves — all JVM-side.
    """
    nb = max_hamming + 1
    base = 64 // nb
    # band b covers [b*base, ...); the last band absorbs the remainder
    bands_meta = [
        (b, b * base + 1, base if b < nb - 1 else 64 - base * (nb - 1))
        for b in range(nb)
    ]
    bands = hashes.select(
        F.col(id_col).alias("_id"),
        F.col(hash_col).alias("_h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.substring(hash_col, start, ln).alias("band_val"),
                    )
                    for b, start, ln in bands_meta
                ]
            )
        ).alias("bd"),
    ).select("_id", "_h", F.col("bd.band_idx").alias("band_idx"), F.col("bd.band_val").alias("band_val"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._h").alias("h_a"),
            F.col("b._h").alias("h_b"),
        )
        .distinct()
    )

    def _half(col: str, start: int) -> F.Column:
        return F.conv(F.substring(col, start, 32), 2, 10).cast("bigint")

    ham = (
        F.bit_count(_half("h_a", 1).bitwiseXOR(_half("h_b", 1)))
        + F.bit_count(_half("h_a", 33).bitwiseXOR(_half("h_b", 33)))
    ).alias("hamming")
    return cand.select("id_a", "id_b", ham).where(F.col("hamming") <= max_hamming)


def _ppm_header_tokens(b: bytes, n_tokens: int) -> tuple[list[bytes], int]:
    """Tokenize a PNM header after the 2-byte magic: whitespace-separated
    integer tokens with ``#``-to-EOL comments. Returns (tokens, index of
    the single whitespace byte that terminates the last token) — the
    raster begins exactly one byte after that (PNM spec)."""
    toks: list[bytes] = []
    i = 2
    while len(toks) < n_tokens and i < len(b):
        c = b[i : i + 1]
        if c == b"#":
            while i < len(b) and b[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(b) and not b[j : j + 1].isspace() and b[j : j + 1] != b"#":
                j += 1
            toks.append(b[i:j])
            i = j
    return toks, i


def decode_ppm_bytes(b: bytes):
    """Pure-python binary-PNM decoder: P6 (RGB) / P5 (grayscale),
    maxval 255. Returns (width, height, mode, float32 pixels in [0,1])
    or None if the blob is not a decodable PPM/PGM. Matches PIL's
    decode of the same blob bit-for-bit (same /255 float32 math)."""
    if b[:2] not in (b"P5", b"P6"):
        return None
    toks, end = _ppm_header_tokens(b, 3)
    if len(toks) < 3:
        return None
    try:
        w, h, mx = (int(t) for t in toks)
    except ValueError:
        return None
    if mx != 255 or w <= 0 or h <= 0:
        return None
    ch = 3 if b[:2] == b"P6" else 1
    raster = b[end + 1 : end + 1 + w * h * ch]
    if len(raster) < w * h * ch:
        return None
    arr = np.frombuffer(raster, dtype=np.uint8).astype(np.float32) / 255.0
    return w, h, ("RGB" if ch == 3 else "L"), arr


def decode_bmp_bytes(b: bytes):
    """Pure-python BMP decoder: uncompressed (BI_RGB) 24-bit with a
    BITMAPINFOHEADER — the plain Windows bitmap. Handles the 4-byte row
    padding and both bottom-up (positive height, flipped to top-down)
    and top-down (negative height) rasters; pixels come out RGB
    interleaved like PIL's. Returns None for anything else."""
    import struct

    if b[:2] != b"BM" or len(b) < 54:
        return None
    off = struct.unpack_from("<I", b, 10)[0]
    hsz = struct.unpack_from("<I", b, 14)[0]
    if hsz < 40:
        return None
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    bottom_up, height = h > 0, abs(h)
    stride = (w * 3 + 3) // 4 * 4
    if len(b) < off + stride * height:
        return None
    rows = (
        np.frombuffer(b, np.uint8, stride * height, off)
        .reshape(height, stride)[:, : w * 3]
        .reshape(height, w, 3)
    )
    rgb = rows[:, :, ::-1]  # BMP stores BGR
    if bottom_up:
        rgb = rgb[::-1]
    return w, height, "RGB", (rgb.astype(np.float32) / 255.0).ravel()


def _decode_blob(blob: bytes):
    """One blob → (w, h, mode, pixels) or None. PIL when installed (the
    production path, every format); otherwise the dependency-free
    built-in codecs (PPM/PGM + 24-bit BMP) so the decode stage stays
    executable — and testable — in environments without imaging libs."""
    try:
        import io

        import PIL.Image as Image

        img = Image.open(io.BytesIO(blob))
        arr = np.asarray(img, dtype=np.float32) / 255.0
        return img.width, img.height, img.mode, arr.ravel()
    except ImportError:
        pass
    except Exception:
        return None
    for codec in (decode_ppm_bytes, decode_bmp_bytes):
        try:
            got = codec(blob)
        except Exception:
            got = None
        if got is not None:
            return got
    return None


def decode_image(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Image decode → (doc_id, width, height, mode, pixels) with pixels
    scaled to [0, 1] float32, row-major, channel-interleaved.
    Undecodable blobs yield a row with NULL width/height/mode/pixels
    (pipeline keeps flowing; callers filter on ``width IS NOT NULL``).

    Codec resolution per worker: Pillow when importable (production —
    every format), else the built-in pure-python PPM/PGM + 24-bit BMP
    decoders (:func:`decode_ppm_bytes` / :func:`decode_bmp_bytes`),
    which match PIL bit-for-bit on those formats — so the decode stage
    executes for real in this sandbox instead of stubbing.

    Spark shape: one Arrow-batched ``mapInPandas`` stage over the binary
    column with a declared schema — identical plumbing to
    :func:`extract_features` / :func:`sample_frames`.
    """
    flat = df.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(content_col).alias("content")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "mode": [], "pixels": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                out["doc_id"].append(doc_id)
                got = _decode_blob(bytes(blob)) if blob is not None else None
                if got is None:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["mode"].append(None)
                    out["pixels"].append(None)
                else:
                    w, h, mode, pixels = got
                    out["width"].append(w)
                    out["height"].append(h)
                    out["mode"].append(mode)
                    out["pixels"].append(pixels)
            yield pd.DataFrame(out)

    return flat.mapInPandas(decode, schema=IMAGE_SCHEMA)


AUDIO_SCHEMA = (
    "doc_id long, n_channels int, sample_rate int, n_frames long, "
    "sum_sq long, peak int"
)


def decode_wav_bytes(b: bytes):
    """Pure-stdlib WAV (RIFF PCM) decoder: returns (n_channels,
    sample_rate, n_frames, samples) with samples as signed int16
    host-order tuples, or None if the blob is not a decodable 16-bit
    PCM WAV. Uses the stdlib ``wave`` module — audio decode runs FOR
    REAL in this sandbox (the image twin of this policy is
    decode_ppm_bytes/decode_bmp_bytes), no external audio libs."""
    import io
    import struct
    import wave

    try:
        with wave.open(io.BytesIO(b)) as w:
            nch = w.getnchannels()
            sw = w.getsampwidth()
            sr = w.getframerate()
            nf = w.getnframes()
            if sw != 2:  # only 16-bit PCM; other widths yield NULL rows
                return None
            raw = w.readframes(nf)
        # A truncated data chunk hands back fewer bytes than the header
        # promises (possibly an ODD count — struct.unpack would raise
        # and kill the whole mapInPandas task). That blob is corrupt:
        # NULL row, pipeline keeps flowing (r12 ADVICE — the unpack
        # lives inside the try and short reads return None explicitly).
        if len(raw) != nf * nch * 2:
            return None
        samples = struct.unpack(f"<{len(raw) // 2}h", raw)
    except Exception:
        return None
    return nch, sr, nf, samples


def decode_audio(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Audio decode + integer-exact feature extract over binary WAV
    payloads: (channels, rate, frames, sum-of-squared-samples, peak
    |amplitude|) per blob. sum_sq and peak are INTEGER functions of the
    PCM words, so downstream filters (silence detection, clipping
    audits, energy thresholds) are bit-reproducible — the audio
    analogue of the byte-exact image features. Undecodable or
    non-16-bit blobs yield NULL stats rows (pipeline keeps flowing).

    Spark shape: one Arrow-batched mapInPandas stage, no shuffle —
    identical plumbing to decode_image.
    """
    flat = df.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(content_col).alias("content")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "n_channels": [],
                "sample_rate": [],
                "n_frames": [],
                "sum_sq": [],
                "peak": [],
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                out["doc_id"].append(doc_id)
                got = decode_wav_bytes(bytes(blob)) if blob is not None else None
                if got is None:
                    for k in ("n_channels", "sample_rate", "n_frames", "sum_sq", "peak"):
                        out[k].append(None)
                else:
                    nch, sr, nf, samples = got
                    out["n_channels"].append(nch)
                    out["sample_rate"].append(sr)
                    out["n_frames"].append(nf)
                    out["sum_sq"].append(sum(s * s for s in samples))
                    out["peak"].append(max((abs(s) for s in samples), default=0))
            yield pd.DataFrame(out)

    return flat.mapInPandas(decode, schema=AUDIO_SCHEMA)
