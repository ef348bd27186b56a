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

__all__ = ["sessionize", "session_counts", "funnel_steps",
           "funnel_conversion", "cohort_retention", "transition_matrix"]


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


def funnel_steps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered-funnel analysis: for each user, the FIRST time of step 1,
    the first step-2 event strictly after that, and so on — the classic
    product-analytics conversion query. Output: one row per user with
    ``t_1 … t_n`` timestamps (null once the funnel breaks).

    Plan shape: one conditional-aggregation pass per step, every one a
    hash aggregate keyed on the user — Catalyst reuses the (user)
    partitioning across the chained joins, so at scale this costs one
    real exchange plus co-partitioned joins, never a per-event window
    sort. Step count is the (small) query constant; events can be
    100 TB."""
    out = (
        df.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            df.where(F.col(type_col) == step)
            .select(F.col(user_col), F.col(ts_col).alias("__t"))
            .join(out.select(user_col, f"t_{i - 1}"), user_col)
            .where(F.col("__t") > F.col(f"t_{i - 1}"))
            .groupBy(user_col)
            .agg(F.min("__t").alias(f"t_{i}"))
        )
        out = out.join(nxt, user_col, "left")
    return out


def funnel_conversion(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Funnel roll-up: (step, step_name, n_users) — how many users
    reached each ordered step. Aggregates :func:`funnel_steps`' tiny
    per-user frame; n_users is monotonically non-increasing."""
    per_user = funnel_steps(df, user_col, ts_col, type_col, steps)
    aggs = [
        F.count(F.col(f"t_{i}")).alias(f"n_{i}")
        for i in range(1, len(steps) + 1)
    ]
    wide = per_user.agg(*aggs)
    pairs = F.explode(
        F.array(*[
            F.struct(
                F.lit(i).alias("step"),
                F.lit(steps[i - 1]).alias("step_name"),
                F.col(f"n_{i}").alias("n_users"),
            )
            for i in range(1, len(steps) + 1)
        ])
    ).alias("s")
    return wide.select(pairs).select("s.step", "s.step_name",
                                     "s.n_users")


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix — the standard product-analytics
    triangle: users are cohorted by their FIRST-activity period, and
    each later period counts how many of the cohort came back.
    Output: (cohort, periods_since, n_users) with periods_since = 0
    being the cohort size itself.

    Plan: one groupBy(user) min-ts aggregate for the cohort label
    (shuffled on the user key), joined back onto the per-user-period
    activity set (also user-keyed — the partitioning is reused), then
    a small (cohorts × horizon) count aggregate. No windows, no
    per-event sort; at 100 TB every stage is a user-keyed hash
    aggregate.

    ``period``: any unit date_trunc accepts ('day', 'week', 'month').
    periods_since counts WHOLE period boundaries between the cohort
    period and the activity period (datediff over the truncated
    dates, divided by the period length in days for day/week;
    months_between for month).
    """
    p = period.lower()
    if p not in ("day", "week", "month"):
        raise ValueError(f"period must be day|week|month, got {period}")
    bucket = F.date_trunc(p, F.col(ts_col)).cast("date")
    activity = df.select(
        F.col(user_col).alias("__u"), bucket.alias("__p")
    ).distinct()
    cohorts = activity.groupBy("__u").agg(F.min("__p").alias("__c"))
    joined = activity.join(cohorts, "__u")
    if p == "month":
        since = F.months_between("__p", "__c").cast("long")
    else:
        days = 1 if p == "day" else 7
        since = (F.datediff("__p", "__c") / days).cast("long")
    return (
        joined.select(F.col("__c").alias("cohort"),
                      since.alias("periods_since"))
        .groupBy("cohort", "periods_since")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort", "periods_since")
    )


def transition_matrix(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    state_col: str,
    decimals: int = 6,
) -> DataFrame:
    """First-order Markov transition counts/probabilities over per-key
    event sequences: (state_from, state_to, n, prob) where prob is the
    row-normalized P(next = to | current = from) — the behavioral
    what-happens-after profile that feeds funnel design and anomaly
    scoring (an unseen transition IS the anomaly).

    ``order_cols`` must be a deterministic total order within a key
    (pass a tie-breaker id after the timestamp, or ties make lead()
    partition-order-dependent). Plan: one per-key lead window + two
    hash aggregates; the denominator attaches via a window over the
    (|states|²-bounded) count table, so nothing joins back to the
    data. All counts exact; one division at the end."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        *[F.col(c) for c in order_cols]
    )
    steps = (
        df.select(
            F.col(key_col),
            *[F.col(c) for c in order_cols],
            F.col(state_col).alias("state_from"),
        )
        .withColumn("state_to", F.lead("state_from").over(w))
        .where(F.col("state_to").isNotNull())
    )
    counts = steps.groupBy("state_from", "state_to").agg(
        F.count(F.lit(1)).alias("n")
    )
    wrow = Window.partitionBy("state_from")
    return counts.select(
        "state_from",
        "state_to",
        "n",
        F.round(
            F.col("n") / F.sum("n").over(wrow).cast("double"), decimals
        ).alias("prob"),
    )
