"""Streaming jobs: windowed per-day counts and streaming dedup.

File-source streams (parquet dirs) drive local smoke tests via the
memory sink + processAllAvailable(); production swaps the source/sink
(Kafka, Delta) without touching the transformation, which is the point
of Structured Streaming's unified API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["streaming_day_counts", "streaming_dedup", "run_stream_to_memory"]


def streaming_day_counts(
    stream: DataFrame, ts_col: str = "ts", watermark: str = "1 day"
) -> DataFrame:
    """Per-day event counts over a stream — the streaming twin of
    operators.timeliness.per_period_counts.

    Watermark bounds state: late rows beyond ``watermark`` are dropped
    and day windows finalize, so state size is O(open windows), not
    O(stream length). Output: (day date, n) in update mode.
    """
    windowed = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return windowed.select(F.col("w.start").cast("date").alias("day"), "n")


def streaming_dedup(
    stream: DataFrame, keys: list[str], ts_col: str = "ts",
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming exact dedup on a key set — the streaming twin of
    operators.uniqueness.dedup. dropDuplicatesWithinWatermark keeps
    per-key state only for the watermark horizon (bounded memory at
    100 TB/day feeds; plain dropDuplicates on a stream grows state
    forever)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def run_stream_to_memory(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    transform,
    query_name: str = "stream_out",
    output_mode: str = "update",
) -> DataFrame:
    """Smoke-test runner: parquet-dir file source → ``transform`` →
    memory sink; processes everything available synchronously and
    returns the sink table as a batch DataFrame."""
    stream = (
        spark.readStream.schema(schema).format("parquet").load(source_dir)
    )
    out = transform(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)
