"""Q7 decode quirk matrix (FIXTURES.md §A2.1) + property round-trip."""

import datetime as dt
import random

from pyspark.sql import functions as F

from databricks_flight_etl_spark.functions import (
    derive_date,
    derive_departure_timestamp,
    hhmm_encode,
    union_all,
)

MATRIX = [
    # (DepTime, hour_str, min_str, expected_ts) on 2008-02-23
    (None, None, None, None),
    (1, "00", "1", dt.datetime(2008, 2, 23, 0, 1)),
    (9, "00", "9", dt.datetime(2008, 2, 23, 0, 9)),
    (45, "00", "45", dt.datetime(2008, 2, 23, 0, 45)),
    (945, "9", "45", dt.datetime(2008, 2, 23, 9, 45)),
    (1343, "13", "43", dt.datetime(2008, 2, 23, 13, 43)),
    (2400, "00", "00", dt.datetime(2008, 2, 23, 0, 0)),  # same-day, no rollover
    (2455, "00", "55", dt.datetime(2008, 2, 23, 0, 55)),
]


def test_quirk_matrix(spark):
    df = spark.createDataFrame(
        [(d,) for d, *_ in MATRIX], "DepTime int"
    ).selectExpr("DepTime", "2008 AS Year", "2 AS Month", "23 AS DayofMonth")
    got = {
        r["DepTime"]: (r["DepTime_Hour"], r["DepTime_Min"], r["DepTime_Timestamp"])
        for r in derive_departure_timestamp(df).collect()
    }
    for dep, h, m, ts in MATRIX:
        assert got[dep] == (h, m, ts), (dep, got[dep])


def test_roundtrip_encode_decode(spark):
    """decode(encode(ts)) == minute-truncated ts — EXCEPT the documented
    '24'-prefix quirk: encoded values 240–249 (02:40–02:49) match the
    substring(s,1,2)=='24' branch before the length-3 branch and decode
    to hour '00' (reference NB:263–268 checks the 24-prefix first)."""
    rng = random.Random(7)
    stamps = [
        dt.datetime(2024, rng.randint(1, 12), rng.randint(1, 28),
                    rng.randint(0, 23), rng.randint(0, 59), rng.randint(0, 59))
        for _ in range(200)
    ] + [dt.datetime(2024, 7, 24, 2, 46, 10)]  # force the quirk branch
    df = spark.createDataFrame([(t,) for t in stamps], "ts timestamp")
    enc = df.select(
        "ts",
        hhmm_encode(F.col("ts")).alias("DepTime"),
        F.year("ts").alias("Year"),
        F.month("ts").alias("Month"),
        F.dayofmonth("ts").alias("DayofMonth"),
    )
    out = derive_departure_timestamp(enc).select(
        "ts", "DepTime", "DepTime_Timestamp"
    )
    for r in out.collect():
        expect = r["ts"].replace(second=0, microsecond=0)
        if 240 <= r["DepTime"] <= 249:  # the 24-prefix quirk
            expect = expect.replace(hour=0)
        assert r["DepTime_Timestamp"] == expect, r["DepTime"]


def test_derive_date_midnight(spark):
    df = spark.createDataFrame([(2008, 2, 23)], "Year int, Month int, DayofMonth int")
    row = derive_date(df).collect()[0]
    assert row["DepTime_Date"] == dt.datetime(2008, 2, 23, 0, 0)


def test_union_all_by_name(spark):
    a = spark.createDataFrame([(1, "x")], "id int, v string")
    b = spark.createDataFrame([("y", 2)], "v string, id int")
    rows = union_all([a, b]).collect()
    assert sorted((r["id"], r["v"]) for r in rows) == [(1, "x"), (2, "y")]


def test_roundtrip_hypothesis(spark):
    """Property-based (hypothesis) form of the round-trip: ANY valid
    minute-truncated timestamp survives encode→decode except the
    documented 24x-prefix quirk (SURVEY §5 item 4)."""
    from hypothesis import given, settings, strategies as st

    ts_strategy = st.datetimes(
        min_value=dt.datetime(1990, 1, 1),
        max_value=dt.datetime(2030, 12, 28, 23, 59),
    ).map(lambda t: t.replace(second=0, microsecond=0))

    @settings(max_examples=8, deadline=None)
    @given(st.lists(ts_strategy, min_size=1, max_size=64))
    def run(stamps):
        df = spark.createDataFrame([(t,) for t in stamps], "ts timestamp")
        enc = df.select(
            "ts",
            hhmm_encode(F.col("ts")).alias("DepTime"),
            F.year("ts").alias("Year"),
            F.month("ts").alias("Month"),
            F.dayofmonth("ts").alias("DayofMonth"),
        )
        out = derive_departure_timestamp(enc).select(
            "ts", "DepTime", "DepTime_Timestamp"
        )
        for r in out.collect():
            expect = r["ts"]
            if 240 <= r["DepTime"] <= 249:  # the 24-prefix quirk
                expect = expect.replace(hour=0)
            assert r["DepTime_Timestamp"] == expect, r["DepTime"]

    run()
