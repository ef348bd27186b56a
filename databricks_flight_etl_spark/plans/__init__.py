"""Plan/physical utilities: size estimation, partition sizing, explain.

Replaces the reference's private-API size probe (NB:416–427: RDD
re-pickle → JVM SizeEstimator → 83.98 MB → ceil(MB/200) partitions)
with supported mechanisms, preserving the "≈200 MB per output
partition" semantics (SURVEY §4.3).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

__all__ = ["estimate_bytes", "partitions_for_target", "explain_str"]


def estimate_bytes(df: DataFrame, sample_rows: int = 10_000) -> int:
    """Estimate the in-memory size of ``df`` in bytes.

    Supported-API replacement for the reference's SizeEstimator probe
    (NB:416–427): sample up to ``sample_rows`` rows through Arrow, take
    deep pandas memory usage as avg row size, multiply by count().
    Two jobs, both cheap (the sample short-circuits the scan; the count
    is metadata-only for parquet sources under Catalyst stats).
    """
    n = df.count()
    if n == 0:
        return 0
    k = min(n, sample_rows)
    sample = df.limit(k).toPandas()
    sample_bytes = int(sample.memory_usage(index=False, deep=True).sum())
    return int(sample_bytes / max(k, 1) * n)


def partitions_for_target(est_bytes: int, target_mb: int = 200) -> int:
    """ceil(MB / target) with a floor of 1 — reference NB:426 semantics."""
    mb = est_bytes / 1e6
    return max(1, math.ceil(mb / target_mb))


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """Return the physical plan as a string (for plan-assertion tests:
    check PushedFilters / broadcast joins / WholeStageCodegen spans)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )
