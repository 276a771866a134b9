"""The spark-submit entry point (kgspark/run.py, SURVEY §7.0): run the
CLI as a real subprocess over a tiny corpus — summary JSON on stdout,
triples/manifests written, and a rerun resumes to a no-op."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(*args: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-m", "kgspark.run", *args],
        capture_output=True, text=True, timeout=600,
        cwd=REPO, env={**os.environ, "PYTHONPATH": REPO},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert lines, out.stdout
    return json.loads(lines[-1])


def test_cli_runs_and_resumes(spark, tmp_path):
    from kgspark import datagen

    pages = str(tmp_path / "pages")
    out_dir = str(tmp_path / "kg")
    datagen.write_pages(spark, pages, 40, seed=11, partitions=4)

    s1 = _run_cli("--input", pages, "--out", out_dir,
                  "--master", "local[2]", "--shuffle-partitions", "4")
    assert s1["pages"] == 40 and s1["triples"] > 0 and s1["failed_buckets"] == 0

    # written sinks exist and agree with the summary
    n = spark.read.parquet(os.path.join(out_dir, "triples")).count()
    assert n == s1["triples"]
    assert os.path.isdir(os.path.join(out_dir, "manifests"))
    assert os.path.isdir(os.path.join(out_dir, "entities"))

    # resume: everything complete -> no-op run
    s2 = _run_cli("--input", pages, "--out", out_dir,
                  "--master", "local[2]", "--shuffle-partitions", "4")
    assert s2["pages"] == 0 and s2["triples"] == 0

    # progress report over the manifests
    s3 = _run_cli("--input", pages, "--out", out_dir, "--progress",
                  "--master", "local[2]", "--shuffle-partitions", "4")
    statuses = {r["status"] for r in s3["progress"]}
    assert statuses == {"success"}
