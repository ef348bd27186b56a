"""Round-15 optimization pins: the changed internals keep their values.

Like round 14's pins, these lock the equalities each optimization
depends on — here, that the zero-job spread() decision (file-leaf size
estimate) reproduces the old physical-plan probe's decision on both
sides of the narrowness boundary, and that spread() no longer runs
Spark jobs at DataFrame-construction time (under AQE, ``df.rdd`` on a
plan with exchanges *executes its query stages* — the r15 finding).
"""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F
import pytest

from databricks_flight_etl_spark import partitioning


def _jobs_run_during(spark, fn):
    """Number of Spark jobs triggered while fn() runs."""
    sc = spark.sparkContext
    group = str(uuid.uuid4())
    sc.setJobGroup(group, "job-probe")
    try:
        fn()
    finally:
        sc.setJobGroup(None, None)
    return len(sc.statusTracker().getJobIdsForGroup(group))


def test_spread_estimate_matches_probe_on_narrow_scan(spark, tmp_path):
    """A small single-file parquet scan sits far below
    defaultParallelism under BOTH probes, so spread must still
    repartition — the single-row-group small-file case it exists for."""
    path = str(tmp_path / "narrow.parquet")
    spark.range(100).withColumnRenamed("id", "doc_id").coalesce(
        1
    ).write.parquet(path)
    df = spark.read.parquet(path)
    target = spark.sparkContext.defaultParallelism
    est = partitioning._estimated_scan_splits(df, target)
    probe = df.rdd.getNumPartitions()
    assert est is not None
    assert (est >= target) == (probe >= target)
    out = partitioning.spread(df, "doc_id")
    assert out.rdd.getNumPartitions() == target


def test_spread_runs_zero_jobs_on_exchange_bearing_plans(spark, tmp_path):
    """The old ``.rdd`` probe EXECUTED the plan's query stages under
    AQE (measured 3.97 s of real jobs on the funnel lineage). The
    size-estimate decision must run zero jobs even when the input
    lineage contains joins/aggregates."""
    path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, f"text body {i % 5}") for i in range(200)],
        "doc_id long, text string",
    ).write.parquet(path)
    docs = spark.read.parquet(path)
    keep = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    lineage = docs.join(keep.select("doc_id"), "doc_id", "left_semi")
    n = _jobs_run_during(
        spark, lambda: partitioning.spread(lineage, "doc_id")
    )
    assert n == 0


def test_ppjoin_modes_agree_and_skip_the_probe(spark, tmp_path):
    """'strings' and 'hashed' staging must produce the same pairs as
    the probed 'auto' path on a collision-free corpus, and both
    probe-free modes must run ZERO jobs at construction time."""
    from databricks_flight_etl_spark.operators import dedup

    path = str(tmp_path / "sets.parquet")
    rows = [
        (i, [f"tok{i % 9}_{j}" for j in range(6)] + ["shared"])
        for i in range(30)
    ]
    spark.createDataFrame(rows, "doc_id long, toks array<string>").write.parquet(path)
    df = spark.read.parquet(path)

    def pairs(mode):
        out = dedup.set_similarity_join(
            df, "toks", "doc_id", threshold=0.6, mode=mode
        )
        got = sorted(
            (r["id_a"], r["id_b"], r["jaccard"]) for r in out.collect()
        )
        spark.catalog.clearCache()
        return got

    auto = pairs("auto")
    assert auto  # the corpus must actually produce pairs
    assert pairs("strings") == auto
    assert pairs("hashed") == auto
    # probe-free construction: zero jobs
    for mode in ("strings", "hashed"):
        n = _jobs_run_during(
            spark,
            lambda: dedup.set_similarity_join(
                df, "toks", "doc_id", threshold=0.6, mode=mode
            ),
        )
        assert n == 0, mode
        spark.catalog.clearCache()
    with pytest.raises(ValueError):
        dedup.set_similarity_join(df, "toks", "doc_id", mode="bogus")


def test_ppjoin_injectivity_probe_memoized(spark, tmp_path):
    """Re-constructing the join over the same source plan must reuse
    the probe's verdict (zero jobs) — plan audits construct every
    registry query and previously paid the probe each time."""
    from databricks_flight_etl_spark.operators import dedup

    path = str(tmp_path / "sets2.parquet")
    spark.createDataFrame(
        [(i, [f"w{i}_{j}" for j in range(4)]) for i in range(20)],
        "doc_id long, toks array<string>",
    ).write.parquet(path)
    df = spark.read.parquet(path)
    dedup.set_similarity_join(df, "toks", "doc_id", threshold=0.7)
    spark.catalog.clearCache()
    df2 = spark.read.parquet(path)  # fresh read, same source plan
    n = _jobs_run_during(
        spark,
        lambda: dedup.set_similarity_join(
            df2, "toks", "doc_id", threshold=0.7
        ),
    )
    assert n == 0
    spark.catalog.clearCache()


def test_spread_estimate_formula_scale_adaptive(spark, monkeypatch):
    """The split estimate follows Spark's FilePartition formula: tiny
    inputs estimate far below any core count (repartition fires);
    production-sized inputs estimate >= defaultParallelism (no-op)."""
    df = spark.range(10)  # only carries the session; leaves are faked

    def fake_stats(total, n_files):
        return lambda _df: (total, n_files)

    # 1 MB single file, 32 cores: bytes_per_core < openCost -> est tiny
    monkeypatch.setattr(
        partitioning, "_file_leaf_stats", fake_stats(1 << 20, 1)
    )
    est_small = partitioning._estimated_scan_splits(df, 32)
    assert est_small is not None and est_small < 32
    # 100 GB over 800 files: est = ceil(padded/128MB) >> 32 -> no-op
    monkeypatch.setattr(
        partitioning, "_file_leaf_stats", fake_stats(100 << 30, 800)
    )
    est_big = partitioning._estimated_scan_splits(df, 32)
    assert est_big >= 32
    # mid regime: bytes_per_core governs -> est == target exactly
    # (Spark itself would spread this input across defaultParallelism)
    monkeypatch.setattr(
        partitioning, "_file_leaf_stats", fake_stats(512 << 20, 4)
    )
    est_mid = partitioning._estimated_scan_splits(df, 32)
    assert est_mid == 32
    # no file leaves -> None (caller falls back to the exact probe)
    monkeypatch.setattr(
        partitioning, "_file_leaf_stats", fake_stats(0, 0)
    )
    assert partitioning._estimated_scan_splits(df, 32) is None
