"""Structured Streaming surface.

The reference is strictly batch (SURVEY §2.8) and the engine's resume
story is manifest-based, so streaming is an ADDITIVE surface: continuous
ingestion of newly-crawled page files into the same deterministic
pipeline, and watermarked windowed aggregation over event streams.

Design: the KG phases are pure DataFrame→DataFrame functions, so the
streaming path is `readStream` + `foreachBatch(build_triples)` — one code
path for batch and streaming (the Spark-idiomatic way to reuse a complex
batch pipeline with joins/windows that aren't stream-supported), with
exactly-once sink semantics from the checkpointed batch id.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from kgspark.config import KgConfig
from kgspark.pipeline.ingest import PAGES_SCHEMA


def stream_pages(spark: SparkSession, path: str, max_files_per_trigger: int = 16) -> DataFrame:
    """File-source stream over a growing directory of pages parquet."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def start_triples_stream(
    pages_stream: DataFrame,
    out_dir: str,
    cfg: KgConfig | None = None,
    from_html: bool = True,
    available_now: bool = True,
):
    """pages stream → triples parquet via foreachBatch(build_triples).

    Each micro-batch runs the full deterministic pipeline (per-document
    semantics make batch boundaries safe: no cross-document state) and
    appends; the streaming checkpoint makes delivery exactly-once."""
    from kgspark.pipeline.runner import build_triples

    cfg = cfg or KgConfig()
    triples_path = os.path.join(out_dir, "triples")
    checkpoint = os.path.join(out_dir, "_checkpoint")

    def process_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        out = build_triples(batch_df, cfg, from_html=from_html)
        out.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            triples_path
        )

    writer = (
        pages_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type — the streaming
    twin of ops.events.tumbling_counts; late rows beyond the watermark
    are dropped, state is bounded."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )
