"""Sessionization: gap-based session assignment over event streams.

Extension beyond the reference (which has no window functions at all —
SURVEY §2.11); standard OLAP/clickstream shape: a new session starts
when the gap to the previous event of the same user exceeds the
threshold. Batch implementation is lag + running-sum windows; the
streaming twin is ``F.session_window`` (see streaming.jobs).

Scale note: both windows partition by the user key — one shuffle on
user_id, then per-partition sorted scans. Skewed power-users are the
hazard at 100 TB; AQE skew handling or pre-salting the window key (then
merging sessions that span salt boundaries) addresses it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize", "session_counts"]


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """Add ``session_id`` (1-based per user, in time order).

    The order must be total for determinism — ``tiebreak_col`` breaks
    equal timestamps.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    us = F.unix_micros(F.col(ts_col))
    gap_flag = F.when(
        us - F.lag(us).over(w) > gap_minutes * 60 * 1_000_000, 1
    ).otherwise(0)  # first row: lag NULL → condition NULL → 0
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        "session_id", (F.lit(1) + F.sum(gap_flag).over(running)).cast("bigint")
    )


def session_counts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """Per-user summary: (user, n_events, n_sessions)."""
    s = sessionize(df, user_col, ts_col, gap_minutes, tiebreak_col)
    return s.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("session_id").alias("n_sessions"),
    )
