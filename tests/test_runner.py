"""Resume / idempotence tests for the batch runner (SURVEY §5.2 item 4;
reference contract: completed-year skip at policy_kg_batch_generator.py:
87-99,196-210 — ours is per-url-hash-bucket manifests + anti-join)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kgspark import datagen
from kgspark.config import KgConfig
from kgspark.pipeline.runner import run_pipeline

CFG = KgConfig(num_buckets=8)


def _read_triples(spark, out):
    return spark.read.parquet(os.path.join(out, "triples"))


def _spo_set(df):
    return {
        (r.url, r.subject, r.predicate, r.object, r.inferred)
        for r in df.select("url", "subject", "predicate", "object", "inferred").collect()
    }


@pytest.fixture(scope="module")
def pages_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pages") / "pages")
    datagen.write_pages(spark, p, 60, seed=7, partitions=4)
    return p


def test_full_run_then_rerun_is_noop(spark, tmp_path, pages_path):
    out = str(tmp_path / "out")
    r1 = run_pipeline(spark, pages_path, out, CFG)
    assert r1["pages"] == 60 and r1["triples"] > 0
    baseline = _spo_set(_read_triples(spark, out))

    r2 = run_pipeline(spark, pages_path, out, CFG)
    assert r2["pages"] == 0  # every bucket has a success manifest → skipped
    assert _spo_set(_read_triples(spark, out)) == baseline


def test_partial_run_resumes_to_identical_table(spark, tmp_path, pages_path):
    """Simulate a crash after some buckets: run with only half the
    buckets' manifests surviving, then resume; final table must equal an
    uninterrupted run's."""
    out_full = str(tmp_path / "full")
    run_pipeline(spark, pages_path, out_full, CFG)
    want = _spo_set(_read_triples(spark, out_full))

    out = str(tmp_path / "resumed")
    run_pipeline(spark, pages_path, out, CFG)
    # "crash": drop the manifest rows for half the buckets (their data
    # files may or may not have landed — dynamic overwrite must handle both)
    mpath = os.path.join(out, "manifests")
    m = spark.read.parquet(mpath)
    kept = m.filter(F.col("bucket") % 2 == 0)
    kept.write.mode("overwrite").parquet(str(tmp_path / "m2"))
    spark.read.parquet(str(tmp_path / "m2")).write.mode("overwrite").parquet(mpath)

    r = run_pipeline(spark, pages_path, out, CFG)
    assert 0 < r["pages"] < 60  # only the un-manifested buckets re-ran
    assert _spo_set(_read_triples(spark, out)) == want


def test_force_reruns_everything(spark, tmp_path, pages_path):
    out = str(tmp_path / "out")
    run_pipeline(spark, pages_path, out, CFG)
    r = run_pipeline(spark, pages_path, out, CFG, force=True)
    assert r["pages"] == 60


def test_failed_group_leaves_failure_manifest_and_resumes(
    spark, tmp_path, pages_path, monkeypatch
):
    """S-12: a bucket group that throws must append status='failed'
    manifest rows carrying the error, the other groups must still land,
    and the next run must reprocess exactly the failed buckets."""
    from kgspark.pipeline import runner

    out = str(tmp_path / "out")
    real_build = runner.build_triples
    poisoned_groups = []

    def poisoned(pages, cfg, **kw):
        # group parity of any bucket in this group (groups split on %2)
        buckets = {r.bucket % 2 for r in pages.select("bucket").distinct().collect()}
        if buckets == {1}:
            poisoned_groups.append(1)
            raise RuntimeError("injected extraction failure")
        return real_build(pages, cfg, **kw)

    monkeypatch.setattr(runner, "build_triples", poisoned)
    r1 = run_pipeline(spark, pages_path, out, CFG, bucket_groups=2)
    assert poisoned_groups and r1["failed_buckets"] > 0

    m = spark.read.parquet(os.path.join(out, "manifests"))
    failed = m.filter(F.col("status") == "failed")
    assert failed.count() == r1["failed_buckets"]
    assert failed.filter(
        F.col("error").contains("injected extraction failure")).count() == failed.count()
    ok_buckets = {r.bucket for r in m.filter(F.col("status") == "success").collect()}
    failed_buckets = {r.bucket for r in failed.collect()}
    assert ok_buckets and failed_buckets and not (ok_buckets & failed_buckets)

    # resume without the poison: exactly the failed buckets reprocess
    monkeypatch.setattr(runner, "build_triples", real_build)
    r2 = run_pipeline(spark, pages_path, out, CFG, bucket_groups=2)
    assert r2["failed_buckets"] == 0 and r2["pages"] > 0
    m2 = spark.read.parquet(os.path.join(out, "manifests"))
    reprocessed = {
        r.bucket for r in m2.filter(
            (F.col("run_id") == r2["run_id"]) & (F.col("status") == "success")
        ).collect()
    }
    assert reprocessed == failed_buckets

    # final table equals an uninterrupted run's
    clean = str(tmp_path / "clean")
    run_pipeline(spark, pages_path, clean, CFG)
    assert _spo_set(_read_triples(spark, out)) == _spo_set(_read_triples(spark, clean))


def test_zero_output_bucket_clears_stale_partitions(
    spark, tmp_path, pages_path, monkeypatch
):
    """ADVICE r02: dynamic partition overwrite only rewrites partitions
    present in the new output, so a reprocessed bucket that now yields
    zero triples must have its old triples/mention_partials/edge_partials
    partitions explicitly cleared — no phantom rows may survive."""
    from kgspark.pipeline import runner

    out = str(tmp_path / "out")
    run_pipeline(spark, pages_path, out, CFG)
    t1 = _read_triples(spark, out)
    b0 = int(t1.groupBy("bucket").count().orderBy("bucket").first()["bucket"])
    assert os.path.exists(os.path.join(out, "triples", f"bucket={b0}"))

    real_build = runner.build_triples

    def drop_bucket(pages, cfg, **kw):
        t = real_build(pages, cfg, **kw)
        return t.filter(
            F.pmod(F.xxhash64("url"), F.lit(cfg.num_buckets)).cast("int") != b0)

    monkeypatch.setattr(runner, "build_triples", drop_bucket)
    r = run_pipeline(spark, pages_path, out, CFG, force=True)
    assert r["failed_buckets"] == 0

    for name in ("triples", "mention_partials", "edge_partials"):
        assert not os.path.exists(os.path.join(out, name, f"bucket={b0}")), name
    t2 = _read_triples(spark, out)
    assert t2.filter(F.col("bucket") == b0).count() == 0
    # the bucket still completed (success manifest with rows_out=0)
    m = spark.read.parquet(os.path.join(out, "manifests"))
    last = m.filter((F.col("run_id") == r["run_id"]) & (F.col("bucket") == b0))
    assert last.count() == 1 and last.first()["rows_out"] == 0


def test_entities_edges_tables(spark, tmp_path, pages_path):
    from kgspark.pipeline.runner import edges_table, entities_table

    out = str(tmp_path / "out")
    run_pipeline(spark, pages_path, out, CFG)
    ents = spark.read.parquet(os.path.join(out, "entities"))
    edges = spark.read.parquet(os.path.join(out, "edges"))
    assert ents.filter(F.col("degree") < 0).count() == 0
    assert set(edges.columns) == {"src", "dst", "predicate", "inferred"}
    # every edge endpoint is a known entity
    e = ents.select(F.col("entity").alias("src"))
    assert edges.join(e, "src", "left_anti").count() == 0
    # the partial-aggregate merge must equal a full rebuild over triples
    full = _read_triples(spark, out)
    want_ents = {tuple(r) for r in entities_table(full)
                 .select("entity", "mentions", "degree").collect()}
    got_ents = {tuple(r) for r in ents.select("entity", "mentions", "degree").collect()}
    assert got_ents == want_ents
    want_edges = {tuple(r) for r in edges_table(full).collect()}
    got_edges = {tuple(r) for r in edges.collect()}
    assert got_edges == want_edges


def test_entities_consistent_after_resume(spark, tmp_path, pages_path):
    """Incremental runs merge per-bucket partials; after a crash-resume
    the derived tables must equal an uninterrupted run's."""
    clean = str(tmp_path / "clean")
    run_pipeline(spark, pages_path, clean, CFG)

    out = str(tmp_path / "out")
    run_pipeline(spark, pages_path, out, CFG)
    mpath = os.path.join(out, "manifests")
    m = spark.read.parquet(mpath)
    kept = m.filter(F.col("bucket") % 2 == 0)
    kept.write.mode("overwrite").parquet(str(tmp_path / "m2"))
    spark.read.parquet(str(tmp_path / "m2")).write.mode("overwrite").parquet(mpath)
    run_pipeline(spark, pages_path, out, CFG)

    for table in ("entities", "edges"):
        a = {tuple(r) for r in spark.read.parquet(os.path.join(out, table)).collect()}
        b = {tuple(r) for r in spark.read.parquet(os.path.join(clean, table)).collect()}
        assert a == b


def test_progress_report(spark, tmp_path, pages_path):
    from kgspark.pipeline.runner import progress_report

    out = str(tmp_path / "out")
    run_pipeline(spark, pages_path, out, CFG)
    rep = progress_report(spark, out, num_buckets=CFG.num_buckets).collect()
    by_status = {r.status: r for r in rep}
    assert set(by_status) == {"success"}
    assert by_status["success"].rows_in == 60
    assert by_status["success"].rows_out > 0
    assert by_status["success"].pct_of_keyspace == 100.0


def test_bucketed_output_tables_join_shuffle_free(spark, tmp_path, pages_path):
    """cfg.bucketed_output: entities/edges land as bucketed catalog
    tables whose edges.src ⋈ entities.entity join plans with no
    Exchange, while the path-level parquet contents stay identical to a
    default run's (only the layout/metadata differ)."""
    out = str(tmp_path / "out")
    plain_out = str(tmp_path / "plain")
    cfg = KgConfig(num_buckets=8, bucketed_output=True)
    try:
        run_pipeline(spark, pages_path, out, cfg, table_prefix="kgtest")
        run_pipeline(spark, pages_path, plain_out, CFG)

        ents = spark.table("kgtest_entities")
        edges = spark.table("kgtest_edges")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            j = edges.join(ents, edges["src"] == ents["entity"])
            import contextlib, io
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                j.explain("formatted")
            assert "Exchange" not in buf.getvalue(), buf.getvalue()
            assert j.count() == edges.count()  # every src is an entity
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

        # path readers see the same rows as a non-bucketed run
        for name, cols in (("entities", ["entity", "mentions", "degree"]),
                           ("edges", ["src", "dst", "predicate", "inferred"])):
            got = {tuple(r) for r in spark.read.parquet(
                os.path.join(out, name)).select(*cols).collect()}
            want = {tuple(r) for r in spark.read.parquet(
                os.path.join(plain_out, name)).select(*cols).collect()}
            assert got == want, name
    finally:
        spark.sql("DROP TABLE IF EXISTS kgtest_entities")
        spark.sql("DROP TABLE IF EXISTS kgtest_edges")
