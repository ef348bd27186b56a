"""Generic relational helpers (SURVEY §2.2/2.3/2.5/2.11 X5).

The reference's relational surface is plain DataFrame calls (select,
filter, join, union, orderBy, limit); these helpers add the scale-aware
defaults the notebook lacks (broadcast hints, deterministic top-k).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

__all__ = ["top_k", "join_broadcast_dim", "top_k_per_group"]


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """orderBy + limit — Catalyst compiles to TakeOrderedAndProject
    (no global sort materialization). Pass a TOTAL order (include a
    tie-break key) if the selected set must be deterministic."""
    return df.orderBy(*order).limit(k)


def join_broadcast_dim(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Fact ⋈ dimension with an explicit broadcast hint on the dim side —
    skips shuffling the fact table (reference J1's date spine join is the
    same shape, SURVEY §2.3)."""
    return fact.join(F.broadcast(dim), on, how)


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order: list[Column], k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number window (extension beyond the
    reference, standard OLAP shape). Order must be total for determinism."""
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )
