"""Phase 3 — relationship inference as DataFrame operations.

Reference: entity_standardization.py:190-278 (infer_relationships with
use_llm_for_inference=False): transitive inference (:321-361), lexical
similarity inference (:664-755), dedup (:363-382), final predicate limit +
self-loop filter (:268-275).  All keyed by ``url`` (per-document scope,
distributes across documents).

Scale notes (SURVEY §4):
* transitive = one self-join on (url, object==subject) + one anti-join —
  shuffle on the url+entity key, AQE handles skew.
* lexical = the O(n²)-per-document pair join; n = distinct entities per
  document (bounded by doc size), so the join is (url equi-key) × (pair
  filter) — no corpus-global blowup.  The corpus-global variant of this is
  the MinHash-LSH linking stage (kgspark.pipeline.linking), not this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kgspark.pipeline.exprs import limit_predicate, longest_smallest, word_set


def _edges_with_last_predicate(triples: DataFrame) -> DataFrame:
    """(url, s, o, pred): last predicate in original order wins for
    duplicate (s, o) pairs (reference :334-338 dict overwrite)."""
    return triples.groupBy("url", "subject", "object").agg(
        F.max_by("predicate", "seq").alias("pred")
    )


def transitive_inference(triples: DataFrame) -> DataFrame:
    """A→B→C ⇒ (A, f(p1,p2), C) for absent (A, C) (reference :321-361)."""
    edges = _edges_with_last_predicate(triples)
    a = edges.select(F.col("url").alias("u"), F.col("subject").alias("A"),
                     F.col("object").alias("B"), F.col("pred").alias("p1"))
    b = edges.select(F.col("url").alias("u2"), F.col("subject").alias("B2"),
                     F.col("object").alias("C"), F.col("pred").alias("p2"))
    paths = a.join(b, (a["u"] == b["u2"]) & (a["B"] == b["B2"])).filter(
        F.col("A") != F.col("C")
    )
    existing = edges.select(F.col("url").alias("u"), F.col("subject").alias("A"),
                            F.col("object").alias("C"))
    new = paths.join(existing, ["u", "A", "C"], "left_anti")
    pred = F.when(F.col("p1") == F.col("p2"),
                  F.concat(F.lit("indirectly "), F.col("p1"))
                  ).otherwise(F.concat(F.col("p1"), F.lit(" via "), F.col("B")))
    return new.select(
        F.col("u").alias("url"),
        F.col("A").alias("subject"),
        limit_predicate(pred).alias("predicate"),
        F.col("C").alias("object"),
    ).distinct()


def lexical_inference(triples: DataFrame) -> DataFrame:
    """Shared-word / containment inference over unconnected entity pairs
    (reference :664-755).  Pair enumeration order canonicalized to lexical
    (oracle deviation D2); shared-word pick canonicalized to longest-then-
    smallest (D3)."""
    ents = (
        triples.select("url", F.col("subject").alias("entity"))
        .union(triples.select("url", F.col("object").alias("entity")))
        .distinct()
    )
    e1 = ents.select(F.col("url").alias("u"), F.col("entity").alias("e1"))
    e2 = ents.select(F.col("url").alias("u2"), F.col("entity").alias("e2"))
    pairs = e1.join(e2, (e1["u"] == e2["u2"]) & (e1["e1"] < e2["e2"])).select("u", "e1", "e2")

    # skip pairs already connected in either direction (original edges
    # only).  pairs are enumerated with e1 < e2, so one anti-join against
    # the canonically-oriented edge set covers both directions — one
    # shuffle instead of two.
    edges = triples.select(
        F.col("url").alias("u"),
        F.least("subject", "object").alias("x"),
        F.greatest("subject", "object").alias("y"),
    ).distinct()
    pairs = pairs.join(
        edges,
        (pairs["u"] == edges["u"]) & (pairs["e1"] == edges["x"]) & (pairs["e2"] == edges["y"]),
        "left_anti")

    l1, l2 = F.lower("e1"), F.lower("e2")
    w1, w2 = word_set(l1), word_set(l2)
    scored = pairs.select(
        F.col("u").alias("url"), "e1", "e2",
        l1.alias("l1"), l2.alias("l2"),
        longest_smallest(F.array_intersect(w1, w2)).alias("main"),
        (F.size(F.array_intersect(w1, w2)) > 0).alias("has_shared"),
    )
    # NB reference semantics: pairs WITH shared words but max shared < 4
    # chars emit nothing and are NOT containment-checked (elif chain).
    starts1 = F.col("l1").startswith(F.col("main"))
    starts2 = F.col("l2").startswith(F.col("main"))
    out = scored.select(
        "url",
        F.when(
            F.col("has_shared"),
            F.when(
                F.length("main") >= 4,
                F.when(starts1 & ~starts2,
                       F.struct(F.col("e2").alias("subject"),
                                F.lit("relates to").alias("predicate"),
                                F.col("e1").alias("object")))
                .when(starts2 & ~starts1,
                      F.struct(F.col("e1").alias("subject"),
                               F.lit("relates to").alias("predicate"),
                               F.col("e2").alias("object")))
                .otherwise(F.struct(F.col("e1").alias("subject"),
                                    F.lit("related to").alias("predicate"),
                                    F.col("e2").alias("object"))),
            ),
        )
        .when(F.expr("instr(l2, l1)") > 0,
              F.struct(F.col("e2").alias("subject"), F.lit("is type of").alias("predicate"),
                       F.col("e1").alias("object")))
        .when(F.expr("instr(l1, l2)") > 0,
              F.struct(F.col("e1").alias("subject"), F.lit("is type of").alias("predicate"),
                       F.col("e2").alias("object")))
        .alias("t"),
    ).filter(F.col("t").isNotNull())
    return out.select("url", "t.subject", "t.predicate", "t.object")


def dedup_triples(all_triples: DataFrame) -> DataFrame:
    """(s,p,o)-key dedup: any original (non-inferred) beats inferred; among
    originals the LAST in list order wins the payload (chunk)
    (reference :363-382 dict overwrite semantics)."""
    return all_triples.groupBy("url", "subject", "predicate", "object").agg(
        F.bool_and("inferred").alias("inferred"),
        F.max(F.when(~F.col("inferred"), F.struct("seq", "chunk")))["chunk"].alias("chunk"),
        F.min("seq").alias("seq"),
    )


def infer(triples: DataFrame, partition_by_url: bool = True) -> DataFrame:
    """Full phase 3.  Input: standardized triples
    (url, chunk, seq, subject, predicate, object).

    ``partition_by_url`` hash-partitions the input on ``url`` once:
    every phase-3 groupBy / join key is url-prefixed, so (with
    requireAllClusterKeysForCoPartition=false, set by the session
    factory) the transitive/lexical joins and the edge aggregation all
    reuse that one exchange instead of shuffling per stage."""
    if partition_by_url:
        triples = triples.repartition(F.col("url"))
    originals = triples.select(
        "url", "subject", "predicate", "object", "chunk", "seq",
        F.lit(False).alias("inferred"),
    )
    trans = transitive_inference(triples).select(
        "url", "subject", "predicate", "object",
        F.lit(None).cast("int").alias("chunk"),
        F.lit(None).cast("long").alias("seq"),
        F.lit(True).alias("inferred"),
    )
    lex = lexical_inference(triples).select(
        "url", "subject", "predicate", "object",
        F.lit(None).cast("int").alias("chunk"),
        F.lit(None).cast("long").alias("seq"),
        F.lit(True).alias("inferred"),
    )
    combined = originals.unionByName(trans).unionByName(lex)
    deduped = dedup_triples(combined)
    return (
        deduped.withColumn("predicate", limit_predicate(F.col("predicate")))
        .filter(F.col("subject") != F.col("object"))
    )
