"""SparkSession factory for local testing; cluster-safe defaults.

The reference notebook runs on a managed Databricks cluster and never
configures Spark itself. Here we centralize the session so tests/bench
get a deterministic, UTC-pinned, AQE-enabled local session.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs that correctness depends on (timezone) or that
# keep small-scale plans sane. Applied by tune() even to sessions we did
# not create (e.g. the driver's).
RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Spark 4 defaults ANSI on; the reference ran Spark 3.5-era semantics
    # (NULL-on-error casts, non-erroring div-by-zero) which the quality
    # operators' three-valued-logic behavior assumes.
    "spark.sql.ansi.enabled": "false",
}
# NOTE: timestamp normalization is dtype-adaptive in sources.normalize_timestamp
# (Spark 4.1.2 reads non-UTC-adjusted parquet TIMESTAMP as TIMESTAMP_NTZ and
# ignores spark.sql.legacy.parquet.nanosAsLong) — no session conf involved.


def tune(spark: SparkSession, shuffle_partitions: int | None = None) -> SparkSession:
    """Apply runtime-settable confs to an existing session.

    Timezone pinning matters for oracle parity: Spark renders timestamps
    in the session TZ while DuckDB is UTC-naive, so every date/timestamp
    comparison assumes UTC.
    """
    for k, v in RUNTIME_CONF.items():
        spark.conf.set(k, v)
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return spark


def register_views(spark: SparkSession, tables, prefix: str = "") -> list[str]:
    """Expose DataFrames as session temp views — the dual SQL surface
    (reference Entry 2, SURVEY §3: every operator usable from both the
    DataFrame API and ``spark.sql`` over views). Views wrap the lazy
    plans, not materialized data. Returns the registered names."""
    names = []
    for name, df in tables.items():
        view = f"{prefix}{name}"
        df.createOrReplaceTempView(view)
        names.append(view)
    return names


def get_spark(
    app_name: str = "flight-etl-engine",
    cpus: int | None = None,
    driver_memory: str | None = None,
) -> SparkSession:
    """Create (or fetch) a local SparkSession.

    local[N]: one JVM, N executor threads; spark.driver.memory is the
    only memory knob. On a real cluster these settings are supplied by
    the cluster manager instead.
    """
    cpus = int(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    driver_memory = driver_memory or os.environ.get("SPARK_DRIVER_MEMORY", "16g")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(cpus))
        # bucketed saveAsTable target — keep managed tables out of the repo
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/flight_etl_warehouse"),
        )
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune(spark, shuffle_partitions=cpus)
