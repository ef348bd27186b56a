"""Mergeable sketches for streaming/distributed frequency estimation
(SURVEY §2.11 extension — the 'novel sketch' custom-operator family).

Count-Min Sketch (Cormode & Muthukrishnan 2005): a d×w counter grid;
item t increments cell (i, h_i(t) mod w) for each of d hash rows; the
estimate is the MIN over its d cells — an upper bound on the true
count, within εN with probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.

Why a sketch at 100 TB: the full frequency table of a high-cardinality
column does not fit anywhere, but the d×w grid is a few KB, is built in
ONE pass with a single (row, col) group-by, and two grids MERGE by
cell-wise addition — so per-partition/per-day sketches roll up without
touching raw data again.

Hash family: h_i(t) = first 15 hex digits of md5(i || ':' || t) — an
engine-portable derivation (md5 exists in Spark, DuckDB, Trino, ...),
so any engine reproduces the sketch bit-for-bit; 15 hex digits keep
the value inside a signed 64-bit integer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_build", "cms_merge", "cms_estimate"]


def _cms_col(col: Column, row: int, width: int) -> Column:
    """Cell index of ``col`` in hash row ``row``: md5-derived, portable."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{row}:"), col)), 1, 15), 16, 10
    ).cast("long")
    return (h % width).cast("int")


def cms_build(
    df: DataFrame,
    col: str,
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """Build a Count-Min sketch of ``col``: one row per NON-EMPTY cell,
    (row, col, n). A single explode (narrow, ×depth) + one group-by on
    (row, col) — the only shuffle, keyed on two small ints. Empty cells
    are implicit zeros, so the output is at most depth·width rows no
    matter the input size."""
    c = F.col(col).cast("string")
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cms_col(c, i, width).alias("col"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("cell")
    ).select("cell.row", "cell.col")
    return cells.groupBy("row", "col").agg(F.count(F.lit(1)).alias("n"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (width, depth): cell-wise sum.
    The mergeability is the point — per-shard/per-day sketches roll up
    without rescanning data."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("n").alias("n"))


def cms_estimate(
    sketch: DataFrame,
    terms: list[str],
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """Point estimates for ``terms``: (term, est) where est = min over
    the term's d cells (0 if any cell is empty). The terms table is
    tiny and broadcast; the sketch is at most depth·width rows."""
    spark = sketch.sparkSession
    t = spark.createDataFrame([(x,) for x in terms], "term string")
    probes = t.select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cms_col(F.col("term"), i, width).alias("col"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("cell"),
    ).select("term", "cell.row", "cell.col")
    joined = probes.join(F.broadcast(sketch), ["row", "col"], "left").select(
        "term", F.coalesce("n", F.lit(0)).alias("n")
    )
    return joined.groupBy("term").agg(F.min("n").alias("est"))
