"""One timed KG-construction measurement: fresh JVM, read a pages
parquet, run phases 1-3, count the output; print ONE JSON line with
total seconds + per-phase breakdown.

Used by tools/scaling_bench.py (one subprocess per trial) and directly
for scaling experiments:

    python tools/scale_run.py <cpus> <pages_path>

Env knobs:
  KGSPARK_MAT                localCheckpoint (default) | persist | none
  KGSPARK_SHUFFLE_PARTITIONS absolute override (default: = cpus)
  KGSPARK_INPUT_PARTITIONS   input repartition count (default: = cpus;
                             scaling_bench fixes it data-sized at BOTH
                             levels so the config is level-independent)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(cpus: int, path: str) -> dict:
    from kgspark.config import KgConfig
    from kgspark.pipeline import ingest
    from kgspark.pipeline.runner import build_triples
    from kgspark.session import get_session

    mat = os.environ.get("KGSPARK_MAT", "localCheckpoint")
    shuffle = int(os.environ.get("KGSPARK_SHUFFLE_PARTITIONS", "0")) or cpus
    inparts = int(os.environ.get("KGSPARK_INPUT_PARTITIONS", "0")) or cpus
    spark = get_session(master=f"local[{cpus}]", shuffle_partitions=shuffle,
                        driver_memory="16g",
                        extra_conf={"spark.local.dir": "/dev/shm/spark-local"})
    pages = ingest.read_pages(spark, path)
    # warmup: JVM JIT + whole-stage-codegen compile of the phase plans +
    # python worker pool — one-time costs a long-lived cluster amortizes
    build_triples(pages.limit(60).repartition(min(cpus, inparts)), KgConfig(),
                  from_html=True).count()
    t0 = time.time()
    pages = pages.repartition(inparts)
    timings: dict = {}
    triples = build_triples(pages, KgConfig(), from_html=True,
                            materialize=mat, timings=timings)
    tc = time.time()
    n = triples.count()
    timings["infer+count"] = round(time.time() - tc, 2)
    dt = time.time() - t0
    out = {"cpus": cpus, "seconds": round(dt, 2), "triples": n,
           "mat": mat, "shuffle_partitions": shuffle,
           "input_partitions": inparts, "phases": timings}
    print(json.dumps(out))
    spark.stop()
    return out


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2])
