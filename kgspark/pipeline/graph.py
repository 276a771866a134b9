"""Iterative graph algorithms on edge DataFrames.

Connected components via min-label propagation (GraphFrames-style) —
reference analog: recursive DFS at entity_standardization.py:280-319
(stack-bound, single-machine).  Ours is the standard large-graph
formulation: labels converge to the component minimum in O(diameter)
join+agg rounds, with ``localCheckpoint`` every few rounds to cut lineage
(SURVEY §4 "iterative CC at scale").

Edges may carry an optional group key column (e.g. ``url``) so components
are computed per group in one job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    key: str | None = None,
    max_iter: int = 30,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Return (key?, node, component); component = min label in the
    (undirected) component — the reference DFS also follows both edge
    directions (entity_standardization.py:303-310)."""
    kcols = [key] if key else []
    und = (
        edges.select(*kcols, F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(*kcols, F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        und.select(*kcols, F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .persist()
    )

    for it in range(max_iter):
        cond = [und["b"] == labels["node"]]
        if key:
            cond.append(und[key] == labels[key])
        prop = und.join(labels, cond, "inner").select(
            *[und[k] for k in kcols],
            und["a"].alias("node"),
            labels["component"].alias("component"),
        )
        new_labels = (
            labels.select(*kcols, "node", "component")
            .union(prop)
            .groupBy(*kcols, "node")
            .agg(F.min("component").alias("component"))
        )
        if (it + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        new_labels = new_labels.persist()
        changed = (
            new_labels.withColumnRenamed("component", "c_new")
            .join(labels, [*kcols, "node"])
            .filter(F.col("c_new") != F.col("component"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    und.unpersist()
    return labels


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst",
            key: str | None = None) -> DataFrame:
    """Undirected degree per node (parallel edges deduplicated),
    reference analog: analyze_kg_data.py:201-217 via networkx."""
    kcols = [key] if key else []
    und = (
        edges.select(*kcols, F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(*kcols, F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    return und.groupBy(*kcols, F.col("a").alias("node")).agg(
        F.count("*").alias("degree")
    )
