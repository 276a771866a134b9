"""O-21/O-22 deterministic community-inference stand-ins
(kgspark.pipeline.community) on a hand-verified two-community fixture.

Reference semantics: entity_standardization.py:458-548 (between
communities, top-5, representative entities) and :550-662 (within
communities, top-3 of size ≥5, disconnected shared-word pairs, cap 10).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kgspark.pipeline import community

# community 1 (6 nodes): policy chain; community 2 (4 nodes): beijing
TRIPLES = [
    ("hong kong government", "proposes", "economic policy"),
    ("hong kong government", "governs", "hong kong"),
    ("economic policy", "includes", "fiscal policy"),
    ("fiscal policy", "funds", "government office"),
    ("government office", "drafts", "tax policy"),
    ("beijing", "issues", "national plan"),
    ("central committee", "approves", "national plan"),
    ("central committee", "publishes", "committee report"),
]


def _df(spark):
    return spark.createDataFrame(
        [("u", s, p, o, 0, i, False) for i, (s, p, o) in enumerate(TRIPLES)],
        "url string, subject string, predicate string, object string, "
        "chunk int, seq long, inferred boolean",
    )


def test_between_community_reps(spark):
    """Max-degree representative per community (ties lexical min):
    C1 rep = 'economic policy', C2 rep = 'central committee';
    C1 is larger so it ranks first."""
    out = community.between_community_triples(_df(spark)).collect()
    assert [(r.subject, r.predicate, r.object) for r in out] == [
        ("economic policy", "related to", "central committee")
    ]
    assert all(r.inferred for r in out)


def test_within_community_pairs(spark):
    """Disconnected shared-word pairs of the size-≥5 community, lexical
    order, cap 10 — hand-enumerated."""
    out = community.within_community_triples(_df(spark)).collect()
    got = sorted((r.subject, r.object) for r in out)
    assert got == [
        ("economic policy", "tax policy"),
        ("fiscal policy", "tax policy"),
        ("government office", "hong kong government"),
    ]
    assert all(r.predicate == "associated with" and r.inferred for r in out)


def test_community_inference_shape_and_determinism(spark):
    a = community.community_inference(_df(spark)).collect()
    b = community.community_inference(_df(spark)).collect()
    assert a == b
    assert [r.seq for r in a] == list(range(1, len(a) + 1))
    assert {r.url for r in a} == {"kg://community"}


def test_pipeline_appends_community_triples(spark):
    """Config-gated: build_triples(community_inference_enabled=True)
    appends exactly the O-21/O-22 triples to the phase-3 output."""
    from kgspark.config import KgConfig
    from kgspark.pipeline import ingest
    from kgspark.pipeline.runner import build_triples

    text = ("The government proposes economic policy. "
            "The government supports fiscal policy. "
            "Beijing issues national plan.")
    pages = spark.createDataFrame(
        [("u", None, None, text, "en")], schema=ingest.PAGES_SCHEMA)
    # materialize: the community stage iterates CC over its input — an
    # un-cut lineage would recompute phases 1-3 every iteration
    base = build_triples(pages, KgConfig(), from_html=False)
    plus = build_triples(
        pages, KgConfig(community_inference_enabled=True), from_html=False)
    extra = plus.exceptAll(base)
    rows = extra.collect()
    assert plus.count() >= base.count()
    assert all(r.inferred and r.url == "kg://community" for r in rows)
