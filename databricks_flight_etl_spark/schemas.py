"""Schemas: the reference's explicit 29-column flight schema + helpers.

The flight schema reproduces reference NB:90–120 exactly, including the
load-bearing ``TailNum`` Integer mis-typing (alphanumeric tail numbers
parse to NULL under schema-enforced CSV read; the drop-all-null-columns
operator's observed behavior depends on it — SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

_FLIGHT_FIELDS: list[tuple[str, T.DataType]] = [
    ("Year", T.IntegerType()),
    ("Month", T.IntegerType()),
    ("DayofMonth", T.IntegerType()),
    ("DayOfWeek", T.IntegerType()),
    ("DepTime", T.IntegerType()),
    ("CRSDepTime", T.IntegerType()),
    ("ArrTime", T.IntegerType()),
    ("CRSArrTime", T.IntegerType()),
    ("UniqueCarrier", T.StringType()),
    ("FlightNum", T.IntegerType()),
    ("TailNum", T.IntegerType()),  # sic — see module docstring
    ("ActualElapsedTime", T.IntegerType()),
    ("CRSElapsedTime", T.IntegerType()),
    ("AirTime", T.IntegerType()),
    ("ArrDelay", T.IntegerType()),
    ("DepDelay", T.IntegerType()),
    ("Origin", T.StringType()),
    ("Dest", T.StringType()),
    ("Distance", T.IntegerType()),
    ("TaxiIn", T.IntegerType()),
    ("TaxiOut", T.IntegerType()),
    ("Cancelled", T.IntegerType()),
    ("CancellationCode", T.StringType()),
    ("Diverted", T.IntegerType()),
    ("CarrierDelay", T.IntegerType()),
    ("WeatherDelay", T.IntegerType()),
    ("NASDelay", T.IntegerType()),
    ("SecurityDelay", T.IntegerType()),
    ("LateAircraftDelay", T.IntegerType()),
]

FLIGHT_SCHEMA = T.StructType(
    [T.StructField(name, dtype, True) for name, dtype in _FLIGHT_FIELDS]
)

# Tables the driver provides at /root/testdata/sf*/ (TESTDATA.md). Parquet
# is self-describing; listed here for discovery/validation only.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
