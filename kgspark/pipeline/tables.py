"""Bucketed table layout for the materialized KG relations.

The analytics surface (SURVEY §2.6) re-joins the same materialized
tables on the same keys over and over: ``edges ⋈ entities`` on the
entity name, degree joins, per-period metric joins.  At 100 TB each of
those joins is a full shuffle of the big side — unless the tables are
written **bucketed** by their join key, in which case Spark's scan
reports a hash distribution and the sort-merge/shuffled-hash join runs
with NO Exchange on either side (plan-asserted in
``tests/test_plans.py``).  The one shuffle is paid once, at write time.

This is the table-format analog of the reference's "load everything
into dicts keyed by entity" (analyze_kg_data.py:31-40) — except the
key layout persists across jobs instead of living in one process's
heap.

Notes for a real deployment:

* Both sides of a co-located join must have the SAME bucket count
  (Spark requirement) — pick one corpus-wide ``num_buckets`` and size
  it so a bucket of the largest table fits an executor core
  (e.g. 100 TB / 8192 buckets ≈ 12 GiB per bucket pre-pruning).
* Bucketed writes go through ``saveAsTable`` (catalog-tracked); plain
  ``.parquet(path)`` cannot record bucket metadata.  ``path=`` makes
  the table external so the files live in the lake, not the warehouse
  dir.
* Bucket pruning: an equality filter on the bucket key scans 1/N of
  the files — free point-lookup locality for entity-centric queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: str | list[str],
    num_buckets: int = 64,
    path: str | None = None,
    mode: str = "overwrite",
    sort: bool = True,
) -> None:
    """Write ``df`` as a parquet table bucketed (and by default
    sorted) by ``keys``.  Joins between two tables written with the
    same ``keys``/``num_buckets`` on those keys run shuffle-free;
    sorting additionally lets sort-merge joins skip the per-task sort
    when each bucket lands in one file (write with one task per bucket
    — e.g. ``df.repartition(num_buckets, *keys)`` upstream — to
    guarantee that)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — REQUIRED for the bucket metadata to reach the
    planner (a raw ``spark.read.parquet(path)`` of the same files
    would re-shuffle)."""
    return spark.table(table)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_col: str | None = None,
) -> dict:
    """Small-file compaction for an append-heavy parquet directory —
    streaming micro-batches (`streaming/pipeline.py`) and per-bucket
    dynamic overwrites (`runner.py`) each add files per trigger/bucket,
    and at crawl scale a listing of millions of KB-sized files costs
    more than the scan itself.

    Rewrites the directory to ``ceil(bytes / target_file_bytes)``
    files (per partition when ``partition_col`` is given, preserving
    the partition layout), staging into a sibling ``<path>.__compact__``
    directory and swapping via FS rename, so readers see either the old
    or the new complete directory.  The swap itself (delete + rename)
    is not atomic across the two ops — on a table format (Iceberg)
    prefer its transactional ``rewriteDataFiles``; this utility is for
    the plain-parquet layout.  Returns {files_before, files_after,
    bytes}.
    """
    import math

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    # A partitioned directory compacted WITHOUT partition_col would be
    # silently flattened (`<col>=` dirs read as a data column, rewritten
    # unpartitioned) — after which the streaming sink's dynamic
    # batch_id-partition overwrite no longer replaces a retried batch's
    # rows, breaking exactly-once.  Detect `<col>=<val>` subdirectories
    # and refuse rather than guess: auto-deriving would mask a caller
    # that believes the layout is flat.
    part_dirs = sorted({
        st.getPath().getName().split("=", 1)[0]
        for st in fs.listStatus(p)
        if st.isDirectory() and "=" in st.getPath().getName()
        and not st.getPath().getName().startswith((".", "_"))
    })
    if partition_col is None and part_dirs:
        raise ValueError(
            f"{path} is partitioned by {part_dirs} but partition_col is "
            "None — compacting would flatten the partition layout; pass "
            f"partition_col={part_dirs[0]!r}")
    if partition_col is not None and part_dirs and partition_col not in part_dirs:
        raise ValueError(
            f"{path} is partitioned by {part_dirs}, not by "
            f"partition_col={partition_col!r}")
    summary = fs.getContentSummary(p)
    n_bytes, files_before = summary.getLength(), summary.getFileCount()
    n_files = max(1, math.ceil(n_bytes / target_file_bytes))

    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".__compact__"
    if partition_col is not None:
        # files-per-partition-value from the FS listing (partition dirs
        # are already enumerated); a salt column spreads each value over
        # that many tasks — repartition(n, partition_col) alone would
        # funnel every value through ONE task (hash partitioning) and
        # ignore target_file_bytes, and a plain round-robin would write
        # n_files files into EVERY partition dir
        from pyspark.sql import functions as F

        n_values = max(1, sum(
            1 for st in fs.listStatus(p)
            if st.getPath().getName().startswith(f"{partition_col}=")))
        n_per = max(1, round(n_files / n_values))
        data_cols = [c for c in df.columns if c != partition_col]
        salt = F.pmod(F.xxhash64(*data_cols), F.lit(n_per))
        w = (
            df.repartition(n_values * n_per, F.col(partition_col), salt)
            .write.partitionBy(partition_col)
        )
    else:
        w = df.repartition(n_files).write
    w.mode("overwrite").parquet(tmp)

    tmp_p = jvm.org.apache.hadoop.fs.Path(tmp)
    fs.delete(p, True)
    if not fs.rename(tmp_p, p):
        raise IOError(f"compaction swap failed: rename {tmp} -> {path}")
    after = fs.getContentSummary(p)
    return {"files_before": int(files_before),
            "files_after": int(after.getFileCount()),
            "bytes": int(n_bytes)}
