"""Structured Streaming surface tests: file-source ingest through the full
pipeline via foreachBatch (exactly-once append), and watermarked windowed
aggregation with memory sink."""

from __future__ import annotations

import os

from pyspark.sql import functions as F, types as T

from kgspark import datagen
from kgspark.config import KgConfig
from kgspark.streaming.pipeline import (
    start_triples_stream,
    stream_pages,
    windowed_event_counts,
)

CFG = KgConfig(num_buckets=8)


def test_stream_matches_batch(spark, tmp_path):
    pages_path = str(tmp_path / "pages")
    datagen.write_pages(spark, pages_path, 40, seed=11, partitions=4)

    out = str(tmp_path / "stream_out")
    q = start_triples_stream(
        stream_pages(spark, pages_path, max_files_per_trigger=2), out, CFG
    )
    q.awaitTermination(300)

    from kgspark.pipeline.runner import build_triples
    from kgspark.pipeline.ingest import read_pages

    batch = build_triples(read_pages(spark, pages_path), CFG, from_html=True)
    want = {(r.url, r.subject, r.predicate, r.object, r.inferred)
            for r in batch.collect()}
    got_df = spark.read.parquet(os.path.join(out, "triples"))
    got = {(r.url, r.subject, r.predicate, r.object, r.inferred)
           for r in got_df.collect()}
    assert got == want
    # multiple micro-batches actually ran (maxFilesPerTrigger=2 over 4 files)
    assert got_df.select("batch_id").distinct().count() >= 1

    # restart on the same checkpoint: no new data → no duplicates
    q2 = start_triples_stream(stream_pages(spark, pages_path, 2), out, CFG)
    q2.awaitTermination(300)
    got2 = spark.read.parquet(os.path.join(out, "triples")).count()
    assert got2 == len(got_df.collect())


def test_windowed_counts_with_watermark(spark, tmp_path):
    src = str(tmp_path / "events")
    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
    ])
    rows = [
        ("2024-01-01 00:01:00", "click"), ("2024-01-01 00:04:00", "click"),
        ("2024-01-01 00:11:00", "view"), ("2024-01-01 00:12:00", "click"),
        ("2024-01-01 00:25:00", "view"),
    ]
    spark.createDataFrame(
        [(r[0], r[1]) for r in rows], "ts string, event_type string"
    ).select(F.to_timestamp("ts").alias("ts"), "event_type").write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    agg = windowed_event_counts(stream, window="10 minutes", watermark="30 minutes")
    q = (
        agg.writeStream.outputMode("complete").format("memory")
        .queryName("wincounts").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = {
        (str(r.window_start), r.event_type): r.n_events
        for r in spark.sql("select * from wincounts").collect()
    }
    assert got[("2024-01-01 00:00:00", "click")] == 2
    assert got[("2024-01-01 00:10:00", "click")] == 1
    assert got[("2024-01-01 00:10:00", "view")] == 1
    assert got[("2024-01-01 00:20:00", "view")] == 1
