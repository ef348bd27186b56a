"""Sessionization: gap-based session assignment (operators.sessions)."""

from datetime import datetime

from pyspark.sql import functions as F

from databricks_flight_etl_spark.operators import sessions


def _ts(h, m, s=0):
    return datetime(2024, 3, 1, h, m, s)


def _events(spark):
    # user 1: three events within 30min, then a 2h gap, then two more
    # user 2: single event
    # user 3: two events exactly 30min apart (boundary: NOT a new session,
    #         since the rule is gap > threshold)
    rows = [
        (1, 1, _ts(9, 0)),
        (2, 1, _ts(9, 10)),
        (3, 1, _ts(9, 39)),
        (4, 1, _ts(11, 40)),
        (5, 1, _ts(11, 55)),
        (6, 2, _ts(10, 0)),
        (7, 3, _ts(8, 0)),
        (8, 3, _ts(8, 30)),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )


def test_sessionize_boundaries(spark):
    out = sessions.sessionize(_events(spark), "user_id", "ts", 30, "event_id")
    got = {r["event_id"]: r["session_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 2, 6: 1, 7: 1, 8: 1}


def test_session_counts(spark):
    out = sessions.session_counts(_events(spark), "user_id", "ts", 30, "event_id")
    got = {
        r["user_id"]: (r["n_events"], r["n_sessions"]) for r in out.collect()
    }
    assert got == {1: (5, 2), 2: (1, 1), 3: (2, 1)}


def test_tiebreak_total_order(spark):
    # two events at the identical timestamp must land deterministically
    # in the same session regardless of input order
    rows = [(10, 9, _ts(9, 0)), (11, 9, _ts(9, 0)), (12, 9, _ts(10, 0))]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = sessions.sessionize(df, "user_id", "ts", 30, "event_id")
    got = {r["event_id"]: r["session_id"] for r in out.collect()}
    assert got == {10: 1, 11: 1, 12: 2}


def test_planted_near_dups_found(spark):
    """The harness's planted-clone construction: each detector must
    recover the perturbed twins (recall check that the rows-only
    harness queries rely on)."""
    from databricks_flight_etl_spark.operators import dedup

    base = (
        "a reasonably long document about distributed query engines, "
        "shuffles, partitions, and adaptive execution strategies in spark"
    )
    rows = [(i, base.replace("spark", f"engine{i}")) for i in range(6)]
    rows.append((100, rows[0][1] + " near duplicate tail"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # threshold 0.6 is below the default 4-band S-curve midpoint (≈0.84),
    # so hunting these pairs needs more bands for recall: 8 bands × 4 rows
    # puts the midpoint at ≈0.59.
    mh = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_dedup_pairs(
            df, "text", "doc_id", threshold=0.6, bands=8
        ).collect()
    }
    assert (0, 100) in mh

    nj = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(
            df, "text", "doc_id", threshold=0.6
        ).collect()
    }
    assert (0, 100) in nj


def test_sessionize_matches_python_reference(spark):
    """Seeded randomized cross-check: Spark sessionization vs a
    pure-Python reference over 60 users x random gaps."""
    import random
    from datetime import datetime, timedelta

    rng = random.Random(7)
    rows = []
    eid = 0
    for u in range(60):
        t = datetime(2024, 1, 1, 0, 0, 0)
        for _ in range(rng.randint(1, 30)):
            t = t + timedelta(minutes=rng.choice([1, 5, 29, 30, 31, 90]))
            rows.append((eid, u, t))
            eid += 1

    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        r["event_id"]: r["session_id"]
        for r in sessions.sessionize(df, "user_id", "ts", 30, "event_id").collect()
    }

    expect = {}
    by_user = {}
    for eid_, u, t in sorted(rows, key=lambda x: (x[1], x[2], x[0])):
        prev = by_user.get(u)
        if prev is None:
            sid = 1
        else:
            gap = (t - prev[0]).total_seconds()
            sid = prev[1] + 1 if gap > 30 * 60 else prev[1]
        by_user[u] = (t, sid)
        expect[eid_] = sid
    assert got == expect


def test_funnel_steps_and_conversion(spark):
    """Strict ordering enforced: step 2 must be AFTER step 1; broken
    funnels stop; conversion counts are monotone non-increasing."""
    from databricks_flight_etl_spark.operators.sessions import (
        funnel_conversion,
        funnel_steps,
    )

    rows = [
        # u1: full funnel in order
        (1, 10, "A"), (1, 20, "B"), (1, 30, "C"),
        # u2: B happens BEFORE A -> funnel stops after A
        (2, 10, "B"), (2, 20, "A"),
        # u3: A only
        (3, 5, "A"),
        # u4: no A at all -> absent
        (4, 1, "B"), (4, 2, "C"),
    ]
    df = spark.createDataFrame(rows, "u long, t long, typ string")
    per_user = {r["u"]: (r["t_1"], r["t_2"], r["t_3"]) for r in
                funnel_steps(df, "u", "t", "typ", ["A", "B", "C"])
                .collect()}
    assert per_user == {
        1: (10, 20, 30),
        2: (20, None, None),
        3: (5, None, None),
    }
    conv = {r["step"]: r["n_users"] for r in
            funnel_conversion(df, "u", "t", "typ", ["A", "B", "C"])
            .collect()}
    assert conv == {1: 3, 2: 1, 3: 1}


def test_cohort_retention(spark):
    """Hand-built cohorts: user 1 active weeks 0 and 2; user 2 only
    week 0; user 3 joins in week 1 and returns week 2."""
    from databricks_flight_etl_spark.operators.sessions import (
        cohort_retention,
    )

    rows = [
        (1, "2024-01-01"), (1, "2024-01-15"),
        (2, "2024-01-02"),
        (3, "2024-01-08"), (3, "2024-01-16"),
        (3, "2024-01-17"),   # same week twice -> still one activity
    ]
    df = spark.createDataFrame(rows, "user_id long, d string").selectExpr(
        "user_id", "CAST(d AS TIMESTAMP) AS ts"
    )
    got = {(str(r["cohort"]), r["periods_since"]): r["n_users"]
           for r in cohort_retention(df, "user_id", "ts", "week").collect()}
    assert got == {
        ("2024-01-01", 0): 2,   # users 1, 2
        ("2024-01-01", 2): 1,   # user 1 returns
        ("2024-01-08", 0): 1,   # user 3's cohort
        ("2024-01-08", 1): 1,   # user 3 returns
    }
    import pytest as _p
    with _p.raises(ValueError):
        cohort_retention(df, "user_id", "ts", "fortnight")


def test_transition_matrix(spark):
    from databricks_flight_etl_spark.operators.sessions import (
        transition_matrix,
    )

    rows = [
        # user 1: A -> B -> A -> C
        (1, 1, "A"), (1, 2, "B"), (1, 3, "A"), (1, 4, "C"),
        # user 2: A -> B (the cross-user boundary must NOT emit B->A)
        (2, 1, "A"), (2, 2, "B"),
        # user 3: single event, no transitions
        (3, 1, "C"),
    ]
    df = spark.createDataFrame(rows, "u long, seq long, state string")
    got = {(r["state_from"], r["state_to"]): (r["n"], r["prob"])
           for r in transition_matrix(df, "u", ["seq"], "state").collect()}
    assert got == {
        ("A", "B"): (2, round(2 / 3, 6)),
        ("A", "C"): (1, round(1 / 3, 6)),
        ("B", "A"): (1, 1.0),
    }
