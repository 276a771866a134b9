"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a struct of metadata;
decode / feature-extract run as Arrow-batched ``mapInPandas`` over the
binary column.  Two decode paths:

* ``decode_image_meta`` — cheap metadata-only variant with a
  deterministic fake decoder (real Spark plumbing — schema, batching,
  partition shape — no byte parsing);
* ``decode_image_real`` — REAL container decode (BMP + PNG via the
  dependency-free ``kgspark.kernels.image_codec``); audio/video codecs
  (jpeg/libav) would slot into the same mapInPandas shape but need
  native libs this container doesn't ship.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("mean_millibyte", T.LongType()),
    ]
)


def with_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Fixture adapter: utf-8-encode a text column into the opaque binary
    payload slot (stands in for image/audio bytes)."""
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, int, int]:
    """Deterministic stand-in for an image decoder: dimensions and mean
    derived purely from the bytes (integer arithmetic only — exactly
    replayable cross-engine).  Replace with PIL/libav in production."""
    n = len(payload)
    width = 64 + (n % 577)
    height = 64 + ((n * 31) % 419)
    n_frames = 1 + (n % 7)
    mean_millibyte = (sum(payload) * 1000) // n if n else 0
    return n, width, height, n_frames, mean_millibyte


def decode_image_meta(payloads: DataFrame) -> DataFrame:
    """mapInPandas decode stub: (doc_id, payload) → DECODED_SCHEMA rows.

    Arrow-batched; one python worker call per partition batch — the real
    shape a PIL/ffmpeg decode would take at scale (CPU-bound per batch,
    no shuffle)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": meta.map(lambda m: m[0]).astype("int32"),
                    "width": meta.map(lambda m: m[1]).astype("int32"),
                    "height": meta.map(lambda m: m[2]).astype("int32"),
                    "n_frames": meta.map(lambda m: m[3]).astype("int32"),
                    "mean_millibyte": meta.map(lambda m: m[4]).astype("int64"),
                }
            )

    return payloads.mapInPandas(decode, DECODED_SCHEMA)


DECODED_REAL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_pixel_bytes", T.IntegerType()),
        T.StructField("mean_millichannel", T.LongType()),
        T.StructField("pix_weighted", T.LongType()),
    ]
)


# synthesis formula for the driver fixture (shared with the DuckDB oracle
# in querybank.SQL_MM_DECODE_REAL — keep the two in lockstep):
#   width  = 8 + doc_id % 9            (8..16)
#   height = 8 + (doc_id * 3) % 7      (8..14)
#   channel value at (x, y, c) = (doc_id + 7x + 13y + 29c) % 256
#   container: BMP for even doc_id, PNG for odd
def _synth_pixels(doc_id: int) -> tuple[int, int, bytes]:
    w = 8 + doc_id % 9
    h = 8 + (doc_id * 3) % 7
    px = bytearray(w * h * 3)
    i = 0
    for y in range(h):
        for x in range(w):
            for c in range(3):
                px[i] = (doc_id + 7 * x + 13 * y + 29 * c) % 256
                i += 1
    return w, h, bytes(px)


def synth_image_payloads(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic real-container image fixtures: (doc_id, payload)
    where payload is an actual BMP (even ids) or PNG (odd ids) encoding
    of the formula pixels above — mapInPandas, so the encode cost
    distributes like a real asset-generation stage would."""
    from kgspark.kernels.image_codec import encode_bmp, encode_png

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()),
         T.StructField("payload", T.BinaryType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def make(doc_id: int) -> bytes:
            w, h, px = _synth_pixels(int(doc_id))
            if doc_id % 2 == 0:
                return encode_bmp(w, h, px)
            return encode_png(w, h, px, channels=3)

        for pdf in batches:
            ids_ = pdf[id_col].astype("int64")
            yield pd.DataFrame({"doc_id": ids_, "payload": ids_.map(make)})

    return ids.select(id_col).mapInPandas(gen, schema)


_DIGEST_W = None  # lazily-grown 1 + i%97 weight vector, shared per worker


def pixel_digests(px: bytes) -> tuple[int, int]:
    """(mean_millichannel, pix_weighted) over a row-major pixel byte
    sequence — numpy int64 sums (exact: n·255·97 < 2^63 up to ~10^15
    pixel bytes, far past any single asset).  ``pixel_digests_scalar``
    is the pure-Python oracle the tests compare against."""
    import numpy as np
    global _DIGEST_W
    n = len(px)
    if not n:
        return 0, 0
    if _DIGEST_W is None or len(_DIGEST_W) < n:
        _DIGEST_W = 1 + np.arange(max(n, 1 << 20), dtype=np.int64) % 97
    a = np.frombuffer(px, np.uint8).astype(np.int64)
    return int(a.sum()) * 1000 // n, int((a * _DIGEST_W[:n]).sum())


def pixel_digests_scalar(px: bytes) -> tuple[int, int]:
    """Scalar parity oracle for ``pixel_digests``."""
    n = len(px)
    if not n:
        return 0, 0
    return (sum(px) * 1000) // n, sum(v * (1 + i % 97) for i, v in enumerate(px))


def decode_image_real(payloads: DataFrame) -> DataFrame:
    """REAL image decode over the opaque binary column: sniffs the
    container (BMP / PNG — `kgspark.kernels.image_codec`, pure Python,
    zlib-backed) and emits per-asset metadata plus two integer pixel
    digests, all exactly replayable cross-engine:

    * ``mean_millichannel`` = 1000·Σ(channel bytes) // n — brightness;
    * ``pix_weighted``      = Σ v_i · (1 + i mod 97) over the row-major
      RGB byte sequence — position-sensitive, so a decoder that gets
      bytes right but ORDER wrong (unfiltering, bottom-up rows, BGR
      swap) fails the digest.

    mapInPandas: Arrow-batched, CPU-bound per batch, no shuffle — the
    same shape a libjpeg/ffmpeg decode takes at corpus scale.  Unlike
    the round-3 stub this is a real decode path; `decode_image_meta`
    remains the cheap metadata-only variant."""
    from kgspark.kernels.image_codec import decode_image

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: dict[str, list] = {f.name: [] for f in DECODED_REAL_SCHEMA.fields}

        def emit(doc_id, payload):
            fmt, w, h, ch, px = decode_image(bytes(payload))
            n = len(px)
            rows["doc_id"].append(int(doc_id))
            rows["fmt"].append(fmt)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["n_channels"].append(ch)
            rows["n_pixel_bytes"].append(n)
            m, pw = pixel_digests(px)
            rows["mean_millichannel"].append(m)
            rows["pix_weighted"].append(pw)

        for pdf in batches:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                emit(doc_id, payload)
            out = pd.DataFrame(rows)
            for k in rows:
                rows[k] = []
            yield out

    return payloads.mapInPandas(decode, DECODED_REAL_SCHEMA)


def frame_sample(decoded: DataFrame, every_k: int = 2) -> DataFrame:
    """Explode per-asset frame indices and keep every k-th frame —
    the video frame-sampling plumbing (pure JVM)."""
    return decoded.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
    ).filter(F.col("frame_idx") % every_k == 0)


def resize_plan(decoded: DataFrame, max_w: int = 224, max_h: int = 224) -> DataFrame:
    """Aspect-preserving resize planning (pure JVM integer arithmetic):
    scale_millis = min(1000, 1000·max_w//w, 1000·max_h//h) — never
    upscale — and resized dims = dim·scale_millis//1000.  The pixel
    resample itself belongs to the (stubbed) decoder; this is the
    deterministic planning/plumbing step a preprocessing pipeline
    schedules work with, exactly replayable cross-engine."""
    scale = F.least(
        F.lit(1000).cast("long"),
        F.floor(F.lit(1000) * max_w / F.col("width")).cast("long"),
        F.floor(F.lit(1000) * max_h / F.col("height")).cast("long"),
    )
    return decoded.select(
        "doc_id", "width", "height",
        scale.alias("scale_millis"),
        (F.col("width") * scale / 1000).cast("long").alias("resized_w"),
        (F.col("height") * scale / 1000).cast("long").alias("resized_h"),
    )


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def byte_histogram_features(payloads: DataFrame, dim: int = 16) -> DataFrame:
    """Feature extraction over the opaque payload: a dim-bucket byte
    histogram (bucket = byte % dim), L1-normalized, rounded to 6dp —
    the deterministic stand-in for an embedding/feature model, with the
    real mapInPandas batch shape (Arrow in, Arrow out, no shuffle)."""

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def hist(b: bytes) -> list[float]:
            n = len(b)
            if not n:
                return [0.0] * dim
            counts = np.bincount(
                np.frombuffer(b, np.uint8) % dim, minlength=dim
            ).astype(np.int64)
            # integer round-half-up to 6dp: Python round() is banker's,
            # SQL round is half-away — integer arithmetic matches both
            # engines' doubles exactly (int64 // is floor division for
            # these non-negative operands, same as Python's)
            return ((2_000_000 * counts + n) // (2 * n)) / 1e6

        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "features": pdf["payload"].map(hist)}
            )

    return payloads.mapInPandas(go, FEATURES_SCHEMA)
