"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32).

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "throughput": {...}}

The headline set covers every execution shape the engine has:
Arrow-UDF kernel pipeline (chunk/extract/standardize/infer), MinHash-LSH
linking + dedup self-joins, iterative connected components, window
functions, scan-heavy JVM expressions, and embedding similarity.

Usage: python bench.py            # one-shot, contract JSON on stdout
       python bench.py --json-only
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run(spark, sf_dir: str) -> tuple[dict, dict]:
    from pyspark.sql import functions as F

    from kgspark import querybank as qb
    from kgspark.config import KgConfig
    from kgspark.pipeline import analytics, linking, relational
    from kgspark.pipeline.graph import connected_components
    from kgspark.pipeline.runner import build_triples

    counters: dict[str, float] = {}

    def docs():
        return spark.read.parquet(f"{sf_dir}/documents.parquet")

    state: dict = {}

    def q_kg_pipeline(spark, sf):
        """Phases 1-3 over the synthetic pages corpus (the product).

        The driver-local corpus is materialized executor-side ONCE
        (inside the timed window) — without the barrier every downstream
        action re-ships the ~20 MB local collection from the driver,
        which benchmarks py4j transport, not the engine."""
        pages = qb._synth_pages(spark, sf).localCheckpoint(eager=True)
        stats = pages.agg(
            F.count("*").alias("n"), F.sum(F.length("text")).alias("c")
        ).collect()[0]
        counters["pages"], counters["chars"] = stats["n"], stats["c"]
        triples = build_triples(pages, KgConfig(), from_html=True)
        t = triples.localCheckpoint(eager=True)
        state["triples"] = t
        counters["triples"] = t.count()
        return None

    def q_kg_linking(spark, sf):
        """MinHash-LSH entity linking over the pipeline's triples."""
        link_map = linking.link_entities(state["triples"], KgConfig())
        counters["linked_variants"] = link_map.count()
        return None

    def q_kg_cc(spark, sf):
        edges = relational.geo_graph_triples(spark, sf).select(
            F.col("subject").alias("src"), F.col("object").alias("dst"))
        counters["cc_nodes"] = connected_components(edges).count()
        return None

    def q_kg_analytics(spark, sf):
        trip = qb._all_triples(spark, sf)
        analytics.top_predicates(trip, 20).collect()
        analytics.entity_frequency(trip, 20).collect()
        analytics.pair_patterns(trip, 10).collect()
        analytics.discourse_shift(
            qb._event_period_triples(spark, sf), "period", qb._EV_THEMES
        ).collect()
        return None

    def q_dedup_lsh(spark, sf):
        from kgspark.ops.dedupe import lsh_dup_pairs
        counters["lsh_pairs"] = lsh_dup_pairs(
            qb._docs_with_near_dups(spark, sf), "doc_id", "text",
            n=3, k=16, bands=8, threshold=0.8,
        ).count()
        return None

    def q_dedup_exact_simhash(spark, sf):
        from kgspark.ops.dedupe import exact_dup_groups, simhash_blocks
        exact_dup_groups(docs(), "doc_id", "text").count()
        simhash_blocks(docs(), "doc_id", "text").count()
        return None

    def q_doc_stats(spark, sf):
        qb.q_doc_quality(spark, sf).count()
        qb.q_doc_tokens(spark, sf).count()
        qb.q_doc_fingerprint(spark, sf).count()
        qb.q_doc_langid(spark, sf).count()
        return None

    def q_emb_topk(spark, sf):
        qb.q_emb_topk(spark, sf).collect()
        return None

    def q_ev_windows(spark, sf):
        qb.q_ev_sessionize(spark, sf).count()
        qb.q_ev_tumbling(spark, sf).count()
        return None

    bench_queries = {
        "kg_pipeline": q_kg_pipeline,
        "kg_linking": q_kg_linking,
        "kg_cc": q_kg_cc,
        "kg_analytics": q_kg_analytics,
        "dedup_lsh": q_dedup_lsh,
        "dedup_exact_simhash": q_dedup_exact_simhash,
        "doc_stats": q_doc_stats,
        "emb_topk": q_emb_topk,
        "ev_windows": q_ev_windows,
    }

    passes = int(os.environ.get("KGSPARK_BENCH_PASSES", "2"))
    max_extra = int(os.environ.get("KGSPARK_BENCH_MAX_EXTRA_PASSES", "2"))
    gate = float(os.environ.get("KGSPARK_BENCH_GATE_RATIO", "1.5"))
    timings: dict[str, float] = {}
    raw: dict[str, list[float]] = {n: [] for n in bench_queries}
    # JMH-style steady-state measurement: run the whole set `passes`
    # times and keep the per-query MIN.  Host contention on this shared
    # box is strictly additive (measured up to 3-4x swings while load
    # inside the VM stays idle — BENCH.md §1), so the min is the least
    # contaminated estimate of engine time; all passes are reported
    # under "runs" for transparency.
    #
    # Contention gate (VERDICT r4 item 6): when the fastest and slowest
    # pass totals disagree by more than KGSPARK_BENCH_GATE_RATIO (1.5x),
    # the run was contended — run extra passes (bounded) so the artifact
    # of record gets at least one clean-ish pass per query; the final
    # ratio and pass totals are emitted so a still-contended artifact is
    # visibly flagged rather than silently trusted.
    pass_totals: list[float] = []

    def one_pass():
        for name, fn in bench_queries.items():
            t0 = time.time()
            fn(spark, sf_dir)
            raw[name].append(round(time.time() - t0, 3))
        pass_totals.append(round(sum(v[-1] for v in raw.values()), 3))

    for _ in range(max(1, passes)):
        one_pass()
    extra = 0
    while (len(pass_totals) >= 2 and extra < max_extra
           and max(pass_totals) / max(min(pass_totals), 1e-9) > gate):
        one_pass()
        extra += 1
    timings = {n: min(v) for n, v in raw.items()}
    counters["runs"] = raw
    counters["pass_totals"] = pass_totals
    counters["contended"] = bool(
        max(pass_totals) / max(min(pass_totals), 1e-9) > gate)
    return timings, counters


def warmup(spark) -> None:
    """Exercise every execution path once on a ~40-page corpus BEFORE the
    timed window: Python worker fork + Arrow codec init, whole-stage
    codegen compilation, broadcast machinery, and the shuffle service all
    pay a one-time JVM cost that a long-lived 100 TB job amortizes to
    zero but a 60 s bench would otherwise charge to the first query
    (measured 4-8 s of the round-2 kg_pipeline number was first-job
    initialization, with run-to-run jitter to match)."""
    from kgspark.config import KgConfig
    from kgspark.pipeline.runner import build_triples

    from kgspark import querybank as qb
    pages = qb._synth_pages(spark, "sf0.002")  # 40 pages
    build_triples(pages, KgConfig(), from_html=True).count()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1

    from kgspark.session import get_session

    spark = get_session(master=f"local[{cpus}]", app_name="kgspark-bench",
                        shuffle_partitions=cpus)
    warmup(spark)
    timings, counters = run(spark, sf_dir)
    # headline = sum of per-query steady-state (min-over-passes) times —
    # the single-pass-equivalent total, not the wall time of all passes
    total = round(sum(timings.values()), 3)

    pipeline_sec = timings.get("kg_pipeline", 0) or 1e-9
    out = {
        "metric": "kgspark_headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": counters.pop("runs", None),
        "pass_totals": counters.pop("pass_totals", None),
        "contended": counters.pop("contended", None),
        "sf": sf,
        "cpus": cpus,
        "throughput": {
            "pipeline_triples_per_sec": round(
                counters.get("triples", 0) / pipeline_sec, 1),
            "pipeline_chars_per_sec": round(
                counters.get("chars", 0) / pipeline_sec, 1),
            "pages": counters.get("pages", 0),
            "triples": counters.get("triples", 0),
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
