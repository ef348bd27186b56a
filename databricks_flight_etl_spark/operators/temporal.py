"""Temporal joins Spark lacks as built-ins: as-of join and
time-bucketed range join (SURVEY §2.11-class extensions; the reference
has no temporal joins at all — its only join is the calendar spine ⟕,
SURVEY §2.3).

Both are expressed as compositions of existing DataFrame ops per the
Spark-first rule: as-of = union + sorted window carry (one shuffle on
the key, a per-partition sorted scan, no range-condition join that
Catalyst would turn into a broadcast-nested-loop); range join =
equi-join on coarse time buckets + exact dedup of the bucket overlap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "asof_join_cogroup", "range_join_time",
           "fill_forward"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "left",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` within the same key group (backward
    as-of, inclusive — the semantics of DuckDB/pandas ASOF JOIN).

    Output: all left columns + right payload columns + ``__matched_ts``
    (the matched right timestamp; NULL when no match). ``how='inner'``
    drops unmatched left rows.

    Plan shape: tag + unionByName both sides, one shuffle partitioning
    by ``keys``, per-partition sort on (ts, side), then
    ``last(_, ignorenulls)`` carries the most recent right values
    forward into each left row. Right rows sort BEFORE left rows at
    equal timestamps, making the match inclusive. Cost is
    sort-of-union, not |left|×|right| — the naive range-predicate join
    Catalyst can't hash. Hot keys: pre-salt by coarse time bucket or
    let AQE split (the window itself is the skew point, as with any
    per-key ordered op).

    Right payload column names must not collide with left's (rename
    before calling); ties on ``right_ts`` within a key resolve to an
    arbitrary tied row — pre-aggregate the right side if that matters.
    """
    rpayload = [c for c in right.columns if c not in keys and c != right_ts]
    lpayload = [c for c in left.columns if c not in keys and c != left_ts]
    overlap = set(rpayload) & set(lpayload)
    if overlap:
        raise ValueError(f"rename right columns colliding with left: {overlap}")

    rtypes = {f.name: f.dataType for f in right.schema.fields}
    ltypes = {f.name: f.dataType for f in left.schema.fields}

    left_part = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *lpayload,
        *[F.lit(None).cast(rtypes[c]).alias(c) for c in rpayload],
        F.lit(None).cast(rtypes[right_ts]).alias("__rts"),
    )
    right_part = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lpayload],
        *rpayload,
        F.col(right_ts).alias("__rts"),
    )
    u = left_part.unionByName(right_part)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc_nulls_first(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(c, ignorenulls=True).over(w).alias(c) for c in rpayload
    ]
    matched = F.last("__rts", ignorenulls=True).over(w).alias("__matched_ts")

    out = (
        u.select(*keys, "__ts", "__is_left", *lpayload, *carried, matched)
        .where(F.col("__is_left") == 1)
        .select(
            *keys,
            F.col("__ts").alias(left_ts),
            *lpayload,
            *rpayload,
            "__matched_ts",
        )
    )
    if how == "inner":
        out = out.where(F.col("__matched_ts").isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join supports 'left'/'inner', got {how!r}")
    return out


def range_join_time(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_minutes: int = 5,
) -> DataFrame:
    """All (left, right) pairs within the same key group whose
    timestamps differ by at most ``tolerance_minutes`` (|lt − rt| ≤ tol,
    inclusive).

    The naive ``|lt − rt| ≤ tol`` predicate gives Catalyst nothing to
    hash on → broadcast-nested-loop. Instead both sides are bucketed to
    ``tolerance``-sized time cells and the right side additionally maps
    to each neighbor cell (−1, 0, +1): any qualifying pair shares a
    (key, cell) coordinate, so the join is a plain equi-join; the exact
    predicate then prunes the corner cases. Shuffle key is
    (keys, cell) — bounded fan-out of 3× on the right side only.
    """
    cell_us = tolerance_minutes * 60 * 1_000_000
    lcell = (F.unix_micros(F.col(left_ts)) / cell_us).cast("long")
    rcell = (F.unix_micros(F.col(right_ts)) / cell_us).cast("long")

    lhs = left.withColumn("__cell", lcell)
    rhs = right.withColumn(
        "__cell",
        F.explode(F.array(rcell - 1, rcell, rcell + 1)),
    )
    joined = lhs.join(rhs, keys + ["__cell"])
    within = (
        F.abs(F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col(right_ts)))
        <= F.lit(cell_us)
    )
    return joined.where(within).drop("__cell")


def asof_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "left",
    max_group_rows: int = 5_000_000,
) -> DataFrame:
    """``asof_join`` via ``cogroup().applyInPandas`` — the cogrouped-
    Arrow API surface: both sides shuffle once on ``keys``, then each
    key's (left, right) pair of pandas frames meets in one Python
    worker and ``pd.merge_asof`` does the backward-inclusive match.

    Same contract as ``asof_join`` (all left columns + right payload +
    ``__matched_ts``); identical certified output. Trade-off vs the
    union+window form: per-key pandas sort/merge beats the JVM window
    when right payloads are wide (no ``last(ignorenulls)`` carry per
    column), while the JVM form wins on narrow payloads and giant key
    groups.

    SKEW GUARD: a cogroup key's BOTH frames must fit one Python
    worker's memory — on a skewed corpus a hot key silently OOMs the
    worker mid-shuffle. The kernel therefore fails fast (before pandas
    allocates merge state) when a group exceeds ``max_group_rows``
    combined rows, naming the offending key; remediation is the JVM
    ``asof_join`` (whole-stage window, AQE-splittable) or pre-bucketing
    the hot key by coarse time range. The guard costs nothing: no extra
    job, just a length check per group.
    """
    import pandas as pd
    from pyspark.sql import types as T

    rpayload = [c for c in right.columns if c not in keys and c != right_ts]
    lfields = list(left.schema.fields)
    rfields = {f.name: f for f in right.schema.fields}
    out_schema = T.StructType(
        lfields
        + [
            T.StructField(c, rfields[c].dataType, True)
            for c in rpayload
        ]
        + [T.StructField("__matched_ts", T.TimestampType(), True)]
    )
    out_cols = [f.name for f in out_schema.fields]

    # Rename THROUGH ALIASES on both sides before the cogroup: when left
    # and right derive from the same parent frame, their columns carry
    # identical attribute ids, and the analyzer's dedup collapses the
    # right side's duplicates — the Python worker then receives a right
    # frame MISSING those columns. Fresh aliases mint fresh ids.
    lren = left.select(
        *[F.col(c).alias(f"__l_{c}") for c in left.columns]
    )
    rren = right.select(
        *[F.col(c).alias(f"__r_{c}") for c in right.columns]
    )
    # Pin the cogroup's parallelism with an EXPLICIT key repartition:
    # AQE coalesces the exchange by shuffle BYTES, and a few MB of
    # key-grouped Arrow input coalesces to ~1 partition — serializing a
    # stage whose cost is Python per GROUP, not bytes (measured 17 s →
    # 3 s at sf0.1). Explicit repartition is exempt from AQE coalescing.
    n_parts = int(
        left.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    lren = lren.repartition(n_parts, *[f"__l_{k}" for k in keys])
    rren = rren.repartition(n_parts, *[f"__r_{k}" for k in keys])

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if len(lpdf) + len(rpdf) > max_group_rows:
            key_desc = (
                {k: lpdf.iloc[0][f"__l_{k}"] for k in keys}
                if len(lpdf)
                else {k: rpdf.iloc[0][f"__r_{k}"] for k in keys}
            )
            raise ValueError(
                f"asof_join_cogroup group {key_desc} has "
                f"{len(lpdf) + len(rpdf)} rows > max_group_rows="
                f"{max_group_rows}; a cogroup key must fit one Python "
                f"worker — use the JVM asof_join for hot keys, or "
                f"pre-bucket this key by coarse time range"
            )
        lpdf = lpdf.rename(
            columns=lambda c: c[4:] if c.startswith("__l_") else c
        ).sort_values(left_ts, kind="mergesort")
        rpdf = rpdf.rename(
            columns=lambda c: c[4:] if c.startswith("__r_") else c
        )
        r = rpdf[[right_ts] + rpayload].rename(
            columns={right_ts: "__matched_ts"}
        ).sort_values("__matched_ts", kind="mergesort")
        merged = pd.merge_asof(
            lpdf,
            r,
            left_on=left_ts,
            right_on="__matched_ts",
            direction="backward",
            allow_exact_matches=True,
        )
        return merged[out_cols]

    out = (
        lren.groupBy(*[f"__l_{k}" for k in keys])
        .cogroup(rren.groupBy(*[f"__r_{k}" for k in keys]))
        .applyInPandas(merge, out_schema)
    )
    if how == "inner":
        out = out.where(F.col("__matched_ts").isNotNull())
    return out


def fill_forward(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_cols: list[str],
    backward: bool = False,
) -> DataFrame:
    """Per-key last-observation-carried-forward over ``order_col`` —
    the gap-fill step of sensor/metric backfills (and the usual prelude
    to an as-of join when the right side is sparse). Each column in
    ``value_cols`` gets a ``{col}_filled`` twin holding the most recent
    non-null value at or before the row (with ``backward=True``, a
    second pass also pulls the NEXT non-null value back across leading
    nulls — standard bfill-after-ffill).

    Plan: one window sort per direction, partitioned on the keys —
    shuffles once on the key, scales with key cardinality like every
    per-key window here. ``F.last(ignorenulls)`` over an unbounded-
    preceding frame is whole-stage-codegen'd; no Python."""
    from pyspark.sql import Window

    fwd = Window.partitionBy(*key_cols).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = df
    for c in value_cols:
        out = out.withColumn(
            f"{c}_filled", F.last(F.col(c), ignorenulls=True).over(fwd)
        )
    if backward:
        bwd = Window.partitionBy(*key_cols).orderBy(
            F.col(order_col).desc()
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        for c in value_cols:
            # last(ignorenulls) over the DESCENDING frame = the nearest
            # FOLLOWING non-null (first() there would grab the farthest)
            out = out.withColumn(
                f"{c}_filled",
                F.coalesce(
                    F.col(f"{c}_filled"),
                    F.last(F.col(c), ignorenulls=True).over(bwd),
                ),
            )
    return out
