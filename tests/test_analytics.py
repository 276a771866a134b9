"""Analytics-surface unit tests (the exact paths are oracle-verified via
the driver harness; this file covers the scale variants)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgspark.pipeline.analytics import basic_stats


def test_basic_stats_approximate_within_rsd(spark):
    """approximate=True (HLL++ sketches) tracks the exact counts within
    a few relative-standard-deviations and keeps the same schema."""
    trips = spark.range(0, 5000).selectExpr(
        "concat('s', id % 700) AS subject",
        "concat('p', id % 40) AS predicate",
        "concat('o', (id * 13) % 1100) AS object",
    )
    exact = basic_stats(trips).collect()[0].asDict()
    approx_df = basic_stats(trips, approximate=True, rsd=0.02)
    approx = approx_df.collect()[0].asDict()
    assert set(approx) == set(exact)
    assert approx["total_triples"] == exact["total_triples"]  # count stays exact
    for k in ("unique_subjects", "unique_predicates", "unique_objects",
              "unique_entities"):
        assert abs(approx[k] - exact[k]) <= max(3, 0.1 * exact[k]), (
            k, approx[k], exact[k])
