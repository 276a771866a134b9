"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a struct of metadata;
decode / feature-extract run as Arrow-batched ``mapInPandas`` over the
binary column.  The actual codec step is STUBBED (no image/audio libs in
this container): ``decode_image_meta`` computes deterministic metadata from
the bytes (real Spark plumbing — schema, batching, partition shape — with a
fake decoder), and ``decode_image_real`` raises ``NotImplementedError``
unless PIL is importable.
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


def decode_image_real(payloads: DataFrame) -> DataFrame:  # pragma: no cover
    """Real decoder slot — requires PIL (absent in this container)."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires pillow; container ships none — "
            "use decode_image_meta (deterministic stub) instead"
        ) from e
    raise NotImplementedError("real decode path not wired in this build")


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
        def hist(b: bytes) -> list[float]:
            n = len(b)
            if not n:
                return [0.0] * dim
            counts = [0] * dim
            for byte in b:
                counts[byte % dim] += 1
            # integer round-half-up to 6dp: Python round() is banker's,
            # SQL round is half-away — integer arithmetic matches both
            # engines' doubles exactly
            return [((2_000_000 * c + n) // (2 * n)) / 1e6 for c in counts]

        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "features": pdf["payload"].map(hist)}
            )

    return payloads.mapInPandas(go, FEATURES_SCHEMA)
