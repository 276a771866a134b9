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
