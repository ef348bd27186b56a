"""Golden-subset differential test (SURVEY §5.3 item 3): a seeded
~1k-row flight-schema table whose profile facts are computed twice —
once in pure Python over the generated rows, once by the engine
pipeline — and must agree exactly. Exercises the §2.10 quirk matrix at
a scale where every code path (null branches, 24xx decode, dup groups,
missing days) actually occurs."""

import datetime as dt
import random
from collections import Counter

from pyspark.sql import functions as F

from databricks_flight_etl_spark import pipeline
from databricks_flight_etl_spark.operators import validity

CARRIERS = ["WN", "AA", "OO", "9E", "DL"]


def _gen_rows(n=1000, seed=1234):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        month = rng.choice([1, 2])
        # day 15 never occurs in month 1 → a guaranteed missing day
        day = rng.choice([d for d in range(1, 28) if (month, d) != (1, 15)])
        r = rng.random()
        if r < 0.03:
            dep = None                      # ~3% null DepTime
        elif r < 0.06:
            dep = rng.randint(1, 99)        # 1-2 digit quirk → hour 00
        elif r < 0.09:
            dep = 2400 + rng.randint(0, 59) # 24xx quirk → 00:xx same day
        else:
            dep = rng.randint(1, 23) * 100 + rng.randint(0, 59)
        rows.append((
            2008, month, day, dep, rng.choice(CARRIERS),
            rng.randint(1, 400), None,       # TailNum all-null
            rng.randint(-1, 2000),           # some invalid distances
        ))
    # plant exact duplicates: repeat the first 3 rows
    rows += rows[:3]
    return rows


def _expected_ts(year, month, day, dep):
    if dep is None:
        return None
    s = str(dep)
    if len(s) < 3 or s[:2] == "24":
        hour = 0
    elif len(s) == 3:
        hour = int(s[0])
    else:
        hour = int(s[:2])
    minute = int(s[-2:])
    if minute > 59:
        # e.g. DepTime=75 → minutes '75' → to_timestamp parse fails →
        # NULL (the reference's non-ANSI decode; pinned in test_derive)
        return None
    return dt.datetime(year, month, day, hour, minute)


def test_golden_flight_profile(spark):
    rows = _gen_rows()
    df = spark.createDataFrame(
        rows,
        "Year int, Month int, DayofMonth int, DepTime int, "
        "UniqueCarrier string, FlightNum int, TailNum int, Distance int",
    )
    rep = pipeline.run_flight_pipeline(
        df,
        dedup_keys=["UniqueCarrier", "FlightNum", "DepTime_Timestamp"],
        rules=[validity.Rule("dist_pos", F.col("Distance") > 0)],
    )

    # Q1: the all-null column is dropped; null profile matches Python
    assert rep.dropped_columns == ["TailNum"]
    n_null_dep = sum(1 for r in rows if r[3] is None)
    prof = {r["column"]: r["n_null"] for r in rep.null_profile.collect()}
    assert prof["DepTime"] == n_null_dep

    # Q3: value frequencies per carrier match a Python Counter
    carrier_counts = Counter(r[4] for r in rows)
    freq = {
        r["value"]: r["n"]
        for r in rep.value_frequencies.collect()
        if r["column"] == "UniqueCarrier"
    }
    assert freq == dict(carrier_counts)

    # Q4: exactly the 3 planted exact-dup groups
    assert rep.exact_dup_groups.count() == 3

    # Q5: validity failures match Python (nulls never fail)
    n_bad_dist = sum(1 for r in rows if r[7] is not None and r[7] <= 0)
    got = {r["rule"]: r["n_fail"] for r in rep.validity.collect()}
    assert got == {"dist_pos": n_bad_dist}

    # Q7 + Q6: per-day counts over the derived timestamp match Python,
    # including the planted missing day (zero-filled by the spine join)
    exp_days = Counter()
    for y, m, d, dep, *_ in rows:
        ts = _expected_ts(y, m, d, dep)
        if ts is not None:
            exp_days[ts.date()] += 1
    cov = {r["day"]: r["n_events"] for r in rep.day_coverage.collect()}
    lo, hi = min(exp_days), max(exp_days)
    span = [lo + dt.timedelta(days=i) for i in range((hi - lo).days + 1)]
    assert cov == {d: exp_days.get(d, 0) for d in span}
    assert cov[dt.date(2008, 1, 15)] == 0


def test_2004_tailnum_zeros_not_dropped(spark):
    """VERDICT r3 #7 — the 2004-shaped quirk (reference DBC[28]): the
    int-typed TailNum parse leaves 81,490 spurious literal ZEROS in
    2004 data (vs all-null in 2008), so the drop-all-null operator is
    SCHEMA- and YEAR-dependent: it must drop TailNum on 2008-shaped
    input and must NOT drop it on 2004-shaped input. Pins the operator
    from both sides."""
    rng = random.Random(2004)
    rows = []
    for i in range(500):
        # ~3% of rows carry the spurious 0 the int parse produced from
        # 2004's numeric-looking tails; the rest parse to NULL
        tail = 0 if rng.random() < 0.03 else None
        rows.append((
            2004, rng.randint(1, 12), rng.randint(1, 28),
            rng.randint(1, 23) * 100 + rng.randint(0, 59),
            rng.choice(CARRIERS), rng.randint(1, 400), tail,
            rng.randint(1, 2000),
        ))
    assert any(r[6] == 0 for r in rows)
    df = spark.createDataFrame(
        rows,
        "Year int, Month int, DayofMonth int, DepTime int, "
        "UniqueCarrier string, FlightNum int, TailNum int, Distance int",
    )
    rep = pipeline.run_flight_pipeline(
        df,
        dedup_keys=["UniqueCarrier", "FlightNum", "DepTime_Timestamp"],
        rules=[validity.Rule("dist_pos", F.col("Distance") > 0)],
    )
    assert rep.dropped_columns == []          # TailNum survives
    assert "TailNum" in rep.cleaned.columns
    prof = {r["column"]: r["n_null"] for r in rep.null_profile.collect()}
    assert prof["TailNum"] == sum(1 for r in rows if r[6] is None)
