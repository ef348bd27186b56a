"""Plan-quality regression tests: pin the physical-plan properties the
100 TB design relies on (SURVEY §4) — filters reach the parquet scan,
columns are pruned, small dims broadcast, top-k avoids a global sort.

These run against the harness queries at sf0.001 (plan shape, not data,
is under test)."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402

from databricks_flight_etl_spark import plans  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_scan_project_pushdown_and_pruning(spark):
    df = entrymod.q_scan_project(spark, SF)
    pf = plans.pushed_filters(df)
    assert any("GreaterThanOrEqual(l_quantity" in f for f in pf), pf
    assert any("LessThanOrEqual(l_quantity" in f for f in pf), pf
    (schema,) = plans.read_schemas(df)
    # 4 projected + 1 filter column — nothing else off the 11-col table
    assert schema.count(":") == 5, schema
    assert "l_partkey" not in schema


def test_multiway_join_broadcasts_dims(spark):
    audit = plans.plan_audit(entrymod.q_join_multiway(spark, SF))
    assert audit["n_broadcast_joins"] >= 1, audit


def test_topk_is_take_ordered(spark):
    df = entrymod.q_topk(spark, SF)
    assert plans.has_operator(df, "TakeOrderedAndProject")
    # global sort never materializes for a limit-k
    assert not plans.has_operator(df, "Sort ")


def test_agg_is_partial_final(spark):
    # partial (map-side) + final HashAggregate around one shuffle
    df = entrymod.q_groupby_count(spark, SF)
    assert plans.count_operator(df, "HashAggregate") >= 2


def test_tpch_q1_filter_pushed(spark):
    df = entrymod.q_tpch_q1(spark, SF)
    pf = plans.pushed_filters(df)
    assert any("l_shipdate" in f for f in pf), pf


def test_semi_join_no_row_widening(spark):
    df = entrymod.q_join_semi(spark, SF)
    p = plans.explain_str(df)
    assert "LeftSemi" in p
