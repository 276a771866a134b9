"""Scaling-efficiency evidence (BASELINE.json north rule): run the SAME
KG-construction job on the SAME on-disk input at two parallelism levels
(local[8] vs local[32] — the sandbox stand-in for N vs 4N executors) and
report throughput at both plus efficiency = (T_8 / T_32) / 4.

The input corpus is generated once (driver-side, excluded from timing) and
written to parquet; each timed run is a fresh subprocess (fresh JVM) that
reads the parquet, runs phases 1-3, and counts the output.

Usage: python tools/scaling_bench.py [n_pages] → prints JSON, updates BENCH.md
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from kgspark.session import get_session
from kgspark.config import KgConfig
from kgspark.pipeline.runner import build_triples
from kgspark.pipeline import ingest

cpus = int(sys.argv[1]); path = sys.argv[2]
spark = get_session(master=f"local[{{cpus}}]", shuffle_partitions=cpus)
pages = ingest.read_pages(spark, path)
pages.count()  # warmup: JVM + parquet footer + python workers
t0 = time.time()
pages = pages.repartition(cpus)
triples = build_triples(pages, KgConfig(), from_html=True)
n = triples.count()
dt = time.time() - t0
print(json.dumps({{"cpus": cpus, "seconds": round(dt, 2), "triples": n}}))
spark.stop()
"""


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    workdir = tempfile.mkdtemp(prefix="kgspark_scale_")
    pages_path = os.path.join(workdir, "pages")

    from kgspark.session import get_session
    from kgspark import datagen

    spark = get_session(master="local[8]", shuffle_partitions=8,
                        app_name="scale-gen")
    datagen.write_pages(spark, pages_path, n_pages, seed=42, partitions=64)
    spark.stop()

    script = RUNNER.format(repo=repo)
    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, "-c", script, str(cpus), pages_path],
            capture_output=True, text=True, timeout=3600,
        )
        line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)

    t8, t32 = results[8]["seconds"], results[32]["seconds"]
    triples = results[32]["triples"]
    eff = round((t8 / t32) / 4.0, 3)
    summary = {
        "n_pages": n_pages,
        "triples": triples,
        "t_local8_sec": t8,
        "t_local32_sec": t32,
        "throughput_8_triples_per_sec": round(triples / t8, 1),
        "throughput_32_triples_per_sec": round(triples / t32, 1),
        "scaling_efficiency_8_to_32": eff,
    }
    print(json.dumps(summary, indent=2))
    return summary


if __name__ == "__main__":
    main()
