"""Partitioning utilities shared across operators.

Spark assigns one scan task per parquet *row group*, not per row: a
small single-row-group file arrives as ONE split no matter what
``spark.sql.files.maxPartitionBytes`` says, which serializes every
narrow map over it (regexp normalization, shingle explode, per-centroid
dot products) onto one core. ``spread`` is the scale-aware escape
hatch: repartition only when the input is narrower than the session's
default parallelism, so it is a no-op on production-sized inputs that
already arrive pre-split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["spread", "local_df"]


def spread(df: DataFrame, *keys: Column | str) -> DataFrame:
    """Raise map-side parallelism when (and only when) the plan's scan
    is narrower than ``sparkContext.defaultParallelism``.

    With ``keys``, hash-repartitions on them — downstream groupBy /
    join on the same keys then reuses the distribution and the plan
    keeps exactly ONE Exchange (verified via explain on the dedup
    signature aggregates). Without keys, round-robin repartitions —
    right for purely per-row work (ANN scoring, quality metrics) where
    balance matters and no downstream key exists.

    The partition probe (``df.rdd.getNumPartitions()``) is driver-side
    plan inspection only; no job runs. Measured on the 32-core local
    harness: 2.3–3.7× on the dedup signature suite, which previously
    ran its whole map side on one core.
    """
    if df.isStreaming:
        # no .rdd on a streaming plan; micro-batch parallelism is the
        # source's concern (maxFilesPerTrigger / kafka partitions)
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if keys:
        return df.repartition(target, *keys)
    return df.repartition(target)


def local_df(spark: SparkSession, rows, schema: str | T.StructType):
    """Driver-side rows → DataFrame with SIZE-AWARE slicing (round-11).

    Plain ``createDataFrame(list)`` parallelizes even a 6-row table
    across ``defaultParallelism`` Python-payload partitions, and every
    consuming exchange drains ALL of them through Python workers —
    measured ~0.8 s per broadcast of a tiny stop list, and ~4.5 s when
    a ``coalesce(1)`` write forced one task to drain 32 sequentially.
    Tiny tables (stop lists, sketch probe terms, centroid tables,
    report spines) therefore get ONE slice; large driver lists (the
    gated ≤1M-edge union-find labels) keep enough slices that
    downstream jobs stay parallel (~100k rows per slice, capped at
    ``defaultParallelism``).
    """
    rows = rows if isinstance(rows, list) else list(rows)
    sc = spark.sparkContext
    if not rows:
        return spark.createDataFrame([], schema)
    slices = max(1, min(sc.defaultParallelism, len(rows) // 100_000))
    return spark.createDataFrame(sc.parallelize(rows, slices), schema)
