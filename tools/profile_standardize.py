"""Standardize-phase substep profile (BENCH.md §2b method: noop-format
writes, NOT count() — count() lets Catalyst drop the unique-key joins
and the whole O-15 second pass, producing a different, cheaper plan).

    python tools/profile_standardize.py [cpus] [pages_path]

Prints one JSON line of substep wall seconds over a phase-1-barriered
triples frame: the entity aggregation, the O-14 canonical pick, the
O-15 fused per-url scan, the full map build, apply's per-url map fold,
and the whole phase.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def main(cpus: int, path: str) -> None:
    from pyspark.sql import functions as F

    from kgspark.config import KgConfig
    from kgspark.pipeline import extraction, ingest, standardize
    from kgspark.pipeline.exprs import norm_key
    from kgspark.session import get_session

    spark = get_session(master=f"local[{cpus}]", shuffle_partitions=cpus,
                        driver_memory="16g",
                        extra_conf={"spark.local.dir": "/dev/shm/spark-local"})
    pages = ingest.read_pages(spark, path)
    cfg = KgConfig()
    # warmup (codegen + python workers), then barrier phase 1 like the runner
    extraction.extract_pipeline_fused(
        pages.limit(40), cfg.chunk_size, cfg.overlap).count()
    triples = extraction.extract_pipeline_fused(
        pages, cfg.chunk_size, cfg.overlap).localCheckpoint(eager=True)
    n = triples.count()

    trip = triples.repartition(F.col("url"))
    out: dict = {"cpus": cpus, "raw_triples": n}

    ents = (
        trip.select("url", F.explode(
            F.array(F.lower("subject"), F.lower("object"))).alias("entity"))
        .groupBy("url", "entity").agg(F.count("*").alias("cnt"))
    )
    blocked = ents.withColumn("norm", norm_key(F.col("entity"))).filter(F.col("norm") != "")
    out["ents_agg"] = noop(blocked)

    out["map_folded"] = noop(standardize.folded_entity_map(trip))
    emap = standardize.build_entity_map(trip)
    out["map_build_rows"] = noop(emap)
    maps_fold = emap.groupBy("url").agg(
        F.map_from_entries(F.collect_list(F.struct("variant", "std"))).alias("_m"))
    out["map_rows_plus_refold"] = noop(maps_fold)
    out["standardize_full"] = noop(standardize.standardize(trip, broadcast_map=False))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8,
         sys.argv[2] if len(sys.argv) > 2 else "/dev/shm/kg_pages_100k")
