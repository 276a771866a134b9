"""Phase 2 — entity standardization as DataFrame operations.

Reference: entity_standardization.py:40-188 (standardize_entities with
use_llm_for_entities=False).  All stages are keyed by ``url`` — the
reference pipeline is per-document (one doc per run), so every groupBy /
window / join here carries ``url`` in its key: the work distributes across
documents with no corpus-global shuffle or collect anywhere.

Stage map (SURVEY §2.4):
  O-11 entity extraction       → union + distinct
  O-12 normalize-for-blocking  → norm_key expression (codegen'd)
  O-13 blocking                → groupBy(url, normalized)
  O-14 canonical pick          → window row_number with the reference's
        exact tie-break (-count, len(entity), entity) — the lexical tail
        reproduces Python's stable sort over the (-len, lex) presort
  O-15 second-pass subset/stem → per-url FUSED pair scan: the distinct
        standard forms of a url are collected into one sorted array and
        the reference's sequential i<j dict-overwrite loop is replayed as
        higher-order-function expressions over that array (last write in
        scan order wins); one-hop application only (the reference does
        NOT transitively close — :160-162).  Earlier rounds used a per-url
        rank self-join + max_by(struct(i, j)); the fused form is
        bit-identical and removes the row_number window sort, both
        sort-merge-join sorts, and the materialized pair stream — measured
        on a 100k-page corpus (1.83M map rows): map build 35.8 s → 13.1 s
        at 8 cores, 74.9 s → 42.0 s at 2 cores, 2→8 scaling efficiency
        0.52 → 0.80.  Safe per-group state: forms-per-url is bounded by
        document size (~18 at the reference's chunking), never by corpus
        size, so the collected arrays stay KB-sized at any scale.
  O-16 apply mapping           → two broadcast-able equi-joins
  O-10 predicate limit, O-18 self-loop filter
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from kgspark.pipeline.exprs import limit_predicate, norm_key, stem_set, word_set


def build_entity_map(triples: DataFrame) -> DataFrame:
    """(url, variant, std): the variant→standard mapping of phase 2."""
    ents = (
        triples.select("url", F.explode(
            F.array(F.lower("subject"), F.lower("object"))).alias("entity"))
        .groupBy("url", "entity")
        .agg(F.count("*").alias("cnt"))  # occurrences as subject or object
    )
    blocked = ents.withColumn("norm", norm_key(F.col("entity"))).filter(F.col("norm") != "")

    # O-14: canonical pick per block — order (-count, char-len, lexical),
    # broadcast to every block member as a frame-unbounded window
    # ``first``.  Earlier rounds used min_by groupBy + join-back ("one
    # less shuffle-sort"), but under the standardize() url partitioning
    # NEITHER formulation exchanges, and then one window sort beats the
    # aggregate plus the join's two sort-merge sorts — measured 3.1 s vs
    # 4.9 s warm on a 30k-page corpus, bit-identical output (entity is
    # unique within a block, so the order is total and deterministic).
    block_w = (
        Window.partitionBy("url", "norm")
        .orderBy(F.col("cnt").desc(), F.length("entity"), F.col("entity"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    map1 = blocked.select(
        "url", F.col("entity").alias("variant"),
        F.first("entity").over(block_w).alias("std1"),
    )

    # O-15: second pass over distinct standard forms, per url — fused.
    # One hash aggregation collects each url's forms into an array sorted
    # by (len(form), form) — exactly the reference's scan rank (ws/ss are
    # struct tail fields; the (l, form) prefix is unique per url so the
    # sort never compares them).  The i<j pair loop then runs as
    # expressions over that array: no window sort, no self-join, no
    # shuffled pair stream (see module docstring for the measured win).
    forms = map1.select("url", F.col("std1").alias("form")).distinct()
    enr = forms.select("url", F.struct(
        F.length("form").alias("l"), F.col("form").alias("form"),
        word_set(F.col("form")).alias("ws"),
        stem_set(word_set(F.col("form"))).alias("ss")).alias("f"))
    g = enr.groupBy("url").agg(F.array_sort(F.collect_list("f")).alias("fs"))

    fs = F.col("fs")
    n = F.size(fs)

    def _resolve(i, j):
        # (len,lex) rank order guarantees len(e1) <= len(e2), so the stem
        # case always remaps e2 → e1 (reference :153-158, sorted order)
        e1 = F.element_at(fs, i + 1)
        e2 = F.element_at(fs, j + 1)
        w1, w2, s1, s2 = e1["ws"], e2["ws"], e1["ss"], e2["ss"]
        sub12 = (F.size(w1) > 0) & (F.size(F.array_except(w1, w2)) == 0)
        sub21 = (F.size(w2) > 0) & (F.size(F.array_except(w2, w1)) == 0)
        shared = F.array_intersect(s1, s2)
        stem_hit = (F.size(shared) > 0) & (
            F.size(shared) / F.greatest(F.size(s1), F.size(s2)) > 0.5)
        return (
            F.when(sub12, F.struct(e2["form"].alias("target"), e1["form"].alias("std2")))
            .when(sub21, F.struct(e1["form"].alias("target"), e2["form"].alias("std2")))
            .when(stem_hit, F.struct(e2["form"].alias("target"), e1["form"].alias("std2")))
        )

    # all i<j hits in scan order (i-major, j ascending — the reference's
    # nested-loop order); n==1 guard: sequence(0, -1) would DESCEND
    pair_hits = F.flatten(F.transform(
        F.sequence(F.lit(0), n - 2),
        lambda i: F.filter(
            F.transform(F.sequence(i + 1, n - 1), lambda j: _resolve(i, j)),
            lambda x: x.isNotNull())))
    empty = F.array().cast("array<struct<target:string,std2:string>>")
    pair_hits = F.when(n >= 2, pair_hits).otherwise(empty)

    # dict-overwrite replay: the LAST write in (i, j) scan order wins ==
    # first occurrence per target over the REVERSED hit list
    dedup = F.aggregate(
        F.reverse(pair_hits), empty,
        lambda acc, p: F.when(
            F.exists(acc, lambda a: a["target"] == p["target"]), acc
        ).otherwise(F.array_append(acc, p)))
    extra = (
        g.select("url", F.explode(dedup).alias("p"))
        .select(F.col("url").alias("_u"), F.col("p.target").alias("_t"),
                F.col("p.std2").alias("std2"))
    )

    # one-hop application on exact-key match only (reference :160-162)
    return (
        map1.join(
            extra,
            (map1["url"] == extra["_u"]) & (map1["variant"] == extra["_t"]),
            "left",
        )
        .select(map1["url"], "variant", F.coalesce("std2", "std1").alias("std"))
    )


def apply_entity_map(triples: DataFrame, entity_map: DataFrame,
                     broadcast_map: bool | None = None,
                     max_broadcast_rows: int = 5_000_000) -> DataFrame:
    """O-16: rewrite subject/object via the mapping; predicate limit;
    default chunk 0; drop self-loops (reference :164-186).

    ``broadcast_map=None`` (default) sizes the map with a count and
    broadcasts only under ``max_broadcast_rows`` (cfg
    ``broadcast_map_max_rows``): the map is per-url so it grows linearly
    with the corpus — an unconditional broadcast OOMs at scale.  Above
    the cutoff the joins shuffle on (url, variant) instead.  The sizing
    count runs on the UNpersisted frame: the map's lineage is a cheap
    aggregation over the (already-barriered) triples, and a persist here
    would leak a cached RDD for the session lifetime, since the output is
    lazy and there is no hook to unpersist after the caller materializes.
    """
    if broadcast_map is None:
        broadcast_map = entity_map.count() <= max_broadcast_rows
    # Fold the per-url rows into ONE map<variant, std> row per url and
    # join ONCE on url, resolving subject and object with element_at
    # lookups.  vs the previous two (url, variant) equi-joins this (a)
    # consumes the entity-map subtree ONCE — the map lineage has no
    # exchange boundary under standardize()'s single-shuffle layout, so
    # Spark cannot ReusedExchange-dedupe a second consumer and would
    # recompute the whole map per join (measured: the fused standardize
    # stage dropped ~495 s → ~250 s of task CPU on a 100k-page corpus);
    # and (b) replaces two derived-key (url, lower(entity)) sort-merge
    # sorts of the full triple stream with one url sort.  variant is
    # unique per (url, variant) by construction (groupBy(url, entity)
    # upstream), which map_from_entries enforces — a duplicate-key error
    # here means the map builder broke that invariant.
    maps = entity_map.groupBy("url").agg(
        F.map_from_entries(F.collect_list(F.struct("variant", "std"))).alias("_m"))
    m = F.broadcast(maps) if broadcast_map else maps
    out = triples.join(
        m.select(F.col("url").alias("_u"), "_m"),
        triples["url"] == F.col("_u"), "left")
    keep = [c for c in triples.columns if c not in ("subject", "predicate", "object", "chunk")]
    return (
        out.select(
            *[triples[c] for c in keep],
            F.coalesce(F.element_at("_m", F.lower(triples["subject"])),
                       triples["subject"]).alias("subject"),
            limit_predicate(triples["predicate"]).alias("predicate"),
            F.coalesce(F.element_at("_m", F.lower(triples["object"])),
                       triples["object"]).alias("object"),
            (F.coalesce(triples["chunk"], F.lit(0)) if "chunk" in triples.columns
             else F.lit(0)).cast("int").alias("chunk"),
        )
        .filter(F.col("subject") != F.col("object"))
    )


def standardize(triples: DataFrame, broadcast_map: bool | None = None,
                max_broadcast_rows: int = 5_000_000,
                partition_by_url: bool = True) -> DataFrame:
    """Full phase 2: build the per-url entity map and apply it.

    ``partition_by_url`` hash-partitions the input on ``url`` ONCE up
    front: every phase-2 groupBy / window / self-join key is
    url-prefixed, and HashPartitioning(url) satisfies each of their
    ClusteredDistribution requirements, so Catalyst drops the per-stage
    exchanges — one shuffle where the naive plan runs ~6 (plan-asserted
    in tests).  The reference is per-document, so per-url partitioning
    is also the semantically natural layout."""
    if partition_by_url:
        triples = triples.repartition(F.col("url"))
    return apply_entity_map(triples, build_entity_map(triples),
                            broadcast_map, max_broadcast_rows)
