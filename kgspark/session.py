"""SparkSession factory with the engine's standard configuration.

AQE on (skew-join + partition coalescing), Arrow transport on, UTC session
timezone (duckdb-oracle comparability), shuffle partitions sized to cores
rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def standard_conf(shuffle_partitions: int) -> dict[str, str]:
    """The engine's standard SQL/exec configuration, master-agnostic —
    shared by ``get_session`` (which also sets a master) and the
    spark-submit entry point ``kgspark.run`` (which must NOT set one:
    spark-submit owns the master/deploy-mode on a real cluster)."""
    return {
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.default.parallelism": str(shuffle_partitions),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # url-prefixed phase-2/3 keys: accept children co-partitioned on a
        # subset of the join keys (url) so one upfront repartition(url)
        # serves every downstream join without re-shuffling
        "spark.sql.requireAllClusterKeysForCoPartition": "false",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        # Long-lived drivers (test suites, multi-batch services) accumulate
        # localCheckpoint/persist/broadcast blocks that ContextCleaner only
        # frees after a driver GC; the 30min default lets a busy JVM OOM
        # before the first sweep.  10min keeps steady-state storage bounded
        # at negligible cost (one System.gc per interval).
        "spark.cleaner.periodicGC.interval": "10min",
    }


def get_session(
    master: str | None = None,
    app_name: str = "kgspark",
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("KGSPARK_MASTER", "local[*]")
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        if cpus:
            shuffle_partitions = int(cpus)
        elif master.startswith("local[") and master[6:-1].isdigit():
            shuffle_partitions = int(master[6:-1])
        else:
            shuffle_partitions = os.cpu_count() or 8
    b = SparkSession.builder.master(master).appName(app_name)
    for k, v in standard_conf(shuffle_partitions).items():
        b = b.config(k, v)
    b = b.config("spark.ui.enabled", "false").config(
        "spark.driver.memory",
        driver_memory or os.environ.get("KGSPARK_DRIVER_MEM", "8g"))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
