"""Driver-contract smoke: entry() runs on sf0.001 and every queries()
entry returns rows with a stable schema (full oracle differential lives
in tools/check_oracle.py and the driver's t2 gate)."""

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def test_entry(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 30
    assert df.schema.simpleString() == "struct<day:date,n_events:bigint>"


def test_queries_and_oracles_paired():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # SURVEY §2 coverage floor
    assert len(qs) >= 26 and len(oracles) >= 26


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    assert df.columns  # stable, non-empty schema
    df.limit(5).collect()


def test_driver_window_queries_scalar_only(spark):
    """The driver's pandas canonicalizer crashes on array/struct/map
    cells — every query inside its 50-entry evaluation window (first 50
    insertion-order keys) must emit only scalar columns. Schema-only:
    building the DataFrame analyzes the plan without running it."""
    from pyspark.sql import types as T

    qs = entrymod.queries()
    for name in list(qs)[:50]:
        df = qs[name](spark, SF_DIR)
        bad = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.StructType, T.MapType))
        ]
        assert not bad, (name, bad)


def test_all_exports_exist():
    """Every name in every module's __all__ must resolve — a missing
    comma in the list silently concatenates two names into one bogus
    entry (found twice in review)."""
    import importlib
    import pkgutil

    import databricks_flight_etl_spark as pkg

    bad = []
    for mi in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
        m = importlib.import_module(mi.name)
        for n in getattr(m, "__all__", []):
            if not hasattr(m, n):
                bad.append((mi.name, n))
    assert bad == []
