"""Property-based (hypothesis) checks for the round-5 operators —
randomized inputs, reference semantics in plain Python."""

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

SET = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

WORDS = ["alpha", "beta", "gamma", "delta", "nav", "bar", "line"]


@given(docs=st.lists(
    st.lists(
        st.lists(st.sampled_from(WORDS), min_size=1, max_size=4),
        min_size=1, max_size=5,
    ),
    min_size=1, max_size=8,
))
@SET
def test_line_dedup_matches_python_reference(spark, docs):
    """line_dedup_global == the plain-Python first-occurrence sweep:
    same surviving (doc, line) set, same in-doc order, same counts."""
    from databricks_flight_etl_spark.operators.text import (
        line_dedup_global,
    )

    rows = [
        (i, "\n".join(" ".join(words) for words in doc))
        for i, doc in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean"], r["n_lines_kept"], r["n_lines_total"])
        for r in line_dedup_global(
            df, "text", "doc_id", min_words=2
        ).collect()
    }
    seen: set[str] = set()
    for i, doc in enumerate(docs):
        kept = []
        for words in doc:
            line = " ".join(words)
            if len(words) < 2 or line in seen:
                continue
            seen.add(line)
            kept.append(line)
        assert got[i] == ("\n".join(kept), len(kept), len(doc))


@given(
    a=st.lists(st.integers(-20, 20), min_size=1, max_size=50),
    b=st.lists(st.integers(-20, 20), min_size=1, max_size=50),
)
@SET
def test_ks_statistic_matches_python_reference(spark, a, b):
    """ks_stat == max CDF gap computed in plain Python; 0 for
    identical multisets; always within [0, 1]."""
    from databricks_flight_etl_spark.operators.accuracy import (
        ks_statistic,
    )

    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    df = spark.createDataFrame(rows, "g string, x double")
    got = ks_statistic(df, "x", "g", "a", "b").first()["ks_stat"]
    values = sorted(set(a) | set(b))
    sa, sb = sorted(a), sorted(b)
    import bisect

    want = max(
        abs(
            bisect.bisect_right(sa, v) / len(a)
            - bisect.bisect_right(sb, v) / len(b)
        )
        for v in values
    )
    assert abs(got - want) < 1e-6 and 0.0 <= got <= 1.0
    if sa == sb:
        assert got == 0.0


@given(
    terms=st.lists(st.integers(0, 30), min_size=1, max_size=120),
    capacity=st.integers(2, 40),
)
@SET
def test_mg_cap_guarantee_random(spark, terms, capacity):
    """After the streamed MG fold over a random 2-batch split: state
    stays <= capacity rows, stored counts never exceed true counts,
    and any term with true count > N/(capacity+1) survives."""
    import tempfile
    from collections import Counter

    from databricks_flight_etl_spark.streaming import (
        streaming_heavy_hitters,
    )

    root = tempfile.mkdtemp(prefix="mg_prop_")
    df = spark.createDataFrame(
        [(i, f"t{t}") for i, t in enumerate(terms)], "i long, term string"
    )
    df.coalesce(2).write.mode("overwrite").parquet(f"{root}/src")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .format("parquet").load(f"{root}/src")
    )
    q = streaming_heavy_hitters(
        stream, "term", f"{root}/state", f"{root}/ckpt",
        capacity=capacity,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["term"]: r["cnt"]
        for r in spark.read.parquet(f"{root}/state").collect()
    }
    true = Counter(f"t{t}" for t in terms)
    n = len(terms)
    assert len(got) <= capacity
    for term, cnt in got.items():
        assert cnt <= true[term]
    for term, cnt in true.items():
        if cnt > n / (capacity + 1):
            assert term in got
