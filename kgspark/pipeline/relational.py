"""Relational triples derivation — SQL-expressible KG inputs.

The kernel path (html → chunks → pattern extraction) is Python-side and
cannot be replayed by an ANSI-SQL oracle.  To hash-verify the *KG operator
semantics* (standardization, inference, dedup, components, analytics —
SURVEY §2.4-2.6) end-to-end against DuckDB, this module derives a triples
relation from the TPC-H-ish test tables with pure relational ops, so the
exact same derivation is expressible in both engines:

  customer --located in--> nation --is part of--> region
  supplier --located in--> nation
  supplier --supplies--> part          (distinct l_suppkey × l_partkey)
  customer --placed--> order-priority  (distinct)

Every triple carries the lineage columns the KG pipeline uses
(url, chunk, seq) built deterministically from the keys, so order-dependent
reference semantics (last-predicate-wins O-23, dedup O-25) stay replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def geo_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer/supplier/nation/region membership triples.

    url groups by entity class so per-url KG stages have multiple groups;
    seq is the source key (stable, dense enough for last-wins replay).
    """
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")

    cust = (
        customer.join(nation, customer["c_nationkey"] == nation["n_nationkey"])
        .select(
            F.lit("rel://customer").alias("url"),
            F.lit(1).alias("chunk"),
            F.col("c_custkey").cast("long").alias("seq"),
            F.col("c_name").alias("subject"),
            F.lit("located in").alias("predicate"),
            F.col("n_name").alias("object"),
        )
    )
    supp = (
        supplier.join(nation, supplier["s_nationkey"] == nation["n_nationkey"])
        .select(
            F.lit("rel://supplier").alias("url"),
            F.lit(1).alias("chunk"),
            F.col("s_suppkey").cast("long").alias("seq"),
            F.col("s_name").alias("subject"),
            F.lit("located in").alias("predicate"),
            F.col("n_name").alias("object"),
        )
    )
    nat = (
        nation.join(region, nation["n_regionkey"] == region["r_regionkey"])
        .select(
            F.lit("rel://nation").alias("url"),
            F.lit(1).alias("chunk"),
            F.col("n_nationkey").cast("long").alias("seq"),
            F.col("n_name").alias("subject"),
            F.lit("is part of").alias("predicate"),
            F.col("r_name").alias("object"),
        )
    )
    return cust.unionByName(supp).unionByName(nat)


GEO_TRIPLES_SQL = """
    SELECT 'rel://customer' AS url, 1 AS chunk, c_custkey AS seq,
           c_name AS subject, 'located in' AS predicate, n_name AS object
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    UNION ALL
    SELECT 'rel://supplier', 1, s_suppkey, s_name, 'located in', n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    UNION ALL
    SELECT 'rel://nation', 1, n_nationkey, n_name, 'is part of', r_name
    FROM nation JOIN region ON n_regionkey = r_regionkey
"""


def geo_graph_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shared url so the graph spans customer→nation→region — the
    input for transitive inference (O-23) and connected components (O-20)."""
    return geo_triples(spark, sf_dir).withColumn("url", F.lit("rel://geo"))


GEO_GRAPH_TRIPLES_SQL = f"""
    SELECT 'rel://geo' AS url, chunk, seq, subject, predicate, object
    FROM ({GEO_TRIPLES_SQL})
"""


def supply_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier --supplies--> part, derived from lineitem (distinct), with
    last-wins lineage seq = max (l_orderkey*10+l_linenumber)."""
    li = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    part = load(spark, sf_dir, "part")
    return (
        li.join(supplier, li["l_suppkey"] == supplier["s_suppkey"])
        .join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("s_name", "p_name")
        .agg(
            F.max(F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("seq")
        )
        .select(
            F.lit("rel://supply").alias("url"),
            F.lit(1).alias("chunk"),
            F.col("seq").cast("long").alias("seq"),
            F.col("s_name").alias("subject"),
            F.lit("supplies").alias("predicate"),
            F.col("p_name").alias("object"),
        )
    )


SUPPLY_TRIPLES_SQL = """
    SELECT 'rel://supply' AS url, 1 AS chunk,
           max(l_orderkey * 10 + l_linenumber) AS seq,
           s_name AS subject, 'supplies' AS predicate, p_name AS object
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN part ON l_partkey = p_partkey
    GROUP BY s_name, p_name
"""


def event_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Styled entity variants from events — standardization (O-11..O-15)
    input with case / stopword / plural / compound variants planted by a
    deterministic per-row rule (replayed verbatim in SQL)."""
    ev = load(spark, sf_dir, "events")
    styled = (
        F.when(F.col("event_id") % 3 == 0, F.upper("event_type"))
        .when(F.col("event_id") % 3 == 1, F.col("event_type"))
        .otherwise(F.concat(F.lit("the "), F.col("event_type")))
    )
    obj = (
        F.when(F.col("event_id") % 7 == 0, F.concat(F.col("event_type"), F.lit(" stream")))
        .when(F.col("event_id") % 11 == 0, F.concat(F.col("event_type"), F.lit("s")))
        .otherwise(F.concat(F.lit("user "), (F.col("user_id") % 10).cast("string")))
    )
    return ev.select(
        F.lit("rel://events").alias("url"),
        F.lit(1).alias("chunk"),
        F.col("event_id").cast("long").alias("seq"),
        styled.alias("subject"),
        F.lit("emits").alias("predicate"),
        obj.alias("object"),
    )


EVENT_TRIPLES_SQL = """
    SELECT 'rel://events' AS url, 1 AS chunk, event_id AS seq,
           CASE WHEN event_id % 3 = 0 THEN upper(event_type)
                WHEN event_id % 3 = 1 THEN event_type
                ELSE 'the ' || event_type END AS subject,
           'emits' AS predicate,
           CASE WHEN event_id % 7 = 0 THEN event_type || ' stream'
                WHEN event_id % 11 = 0 THEN event_type || 's'
                ELSE 'user ' || CAST(user_id % 10 AS VARCHAR) END AS object
    FROM events
"""


def part_entities(spark: SparkSession, sf_dir: str, modulus: int = 50) -> DataFrame:
    """Small part-name entity sample for the O(n²) lexical-inference pair
    join (two-word names share ≥4-char words and containment pairs)."""
    part = load(spark, sf_dir, "part")
    return part.filter(F.col("p_partkey") % modulus == 0).select(
        F.lit("rel://parts").alias("url"),
        F.lit(1).alias("chunk"),
        F.col("p_partkey").cast("long").alias("seq"),
        F.col("p_name").alias("subject"),
        F.lit("is a").alias("predicate"),
        F.col("p_type").alias("object"),
    )


PART_ENTITIES_SQL = """
    SELECT 'rel://parts' AS url, 1 AS chunk, p_partkey AS seq,
           p_name AS subject, 'is a' AS predicate, p_type AS object
    FROM part WHERE p_partkey % 50 = 0
"""
