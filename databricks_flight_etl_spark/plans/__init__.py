"""Plan/physical utilities: size estimation, partition sizing, explain.

Replaces the reference's private-API size probe (NB:416–427: RDD
re-pickle → JVM SizeEstimator → 83.98 MB → ceil(MB/200) partitions)
with supported mechanisms, preserving the "≈200 MB per output
partition" semantics (SURVEY §4.3).
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame

__all__ = [
    "estimate_bytes",
    "partitions_for_target",
    "explain_str",
    "pushed_filters",
    "read_schemas",
    "has_operator",
    "count_operator",
    "lambda_filters",
    "plan_audit",
    "observe_quality",
]


def estimate_bytes(df: DataFrame, sample_rows: int = 10_000) -> int:
    """Estimate the in-memory size of ``df`` in bytes.

    Supported-API replacement for the reference's SizeEstimator probe
    (NB:416–427): sample up to ``sample_rows`` rows through Arrow, take
    deep pandas memory usage as avg row size, multiply by count().
    Two jobs, both cheap (the sample short-circuits the scan; the count
    is metadata-only for parquet sources under Catalyst stats).
    """
    n = df.count()
    if n == 0:
        return 0
    k = min(n, sample_rows)
    sample = df.limit(k).toPandas()
    sample_bytes = int(sample.memory_usage(index=False, deep=True).sum())
    return int(sample_bytes / max(k, 1) * n)


def partitions_for_target(est_bytes: int, target_mb: int = 200) -> int:
    """ceil(MB / target) with a floor of 1 — reference NB:426 semantics."""
    mb = est_bytes / 1e6
    return max(1, math.ceil(mb / target_mb))


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """Return the physical plan as a string (for plan-assertion tests:
    check PushedFilters / broadcast joins / WholeStageCodegen spans)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


# ---------------------------------------------------------------------------
# Plan audit: machine-checkable answers to "is this the plan I'd want at
# 100 TB?" — filters reached the scan, columns pruned, small dims broadcast,
# no surprise shuffles. Used by tests/test_plans.py to pin plan quality.

def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans (flattened).
    Empty list ⇒ nothing pushed — for a filtered parquet scan that's a
    red flag (each filter becomes a post-scan row filter instead of a
    row-group skip)."""
    out: list[str] = []
    for line in explain_str(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            body = line.split(":", 1)[1].strip().strip("[]")
            out.extend(f.strip() for f in body.split(",") if f.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings, one per file scan — verifies column
    pruning (a scan reading all columns for a 2-column projection is
    wasted I/O that scales linearly with data size)."""
    return [
        line.strip().split(":", 1)[1].strip()
        for line in explain_str(df).splitlines()
        if line.strip().startswith("ReadSchema:")
    ]


def count_operator(df: DataFrame, op: str) -> int:
    """Occurrences of a physical operator (e.g. 'BroadcastHashJoin',
    'Exchange', 'HashAggregate') in the formatted plan's tree section.

    Counts UNIQUE operator ids: the plan is a DAG, and a persisted
    subtree referenced from several points (pinned signatures/pairs in
    the dedup pipeline) is printed once per reference but EXECUTES once
    — naive line counting inflated such plans ~30× (993 KB string for
    q_minhash_pairs). Lines without an id fall back to per-line counts."""
    ids: set[str] = set()
    n_no_id = 0
    for line in explain_str(df).splitlines():
        # tree lines look like '+- BroadcastHashJoin Inner BuildRight (16)'
        # or detail headers '(16) BroadcastHashJoin'; count tree lines only.
        s = line.strip()
        if (s.startswith(("+-", ":-", "*", ":  +-")) or s[:1].isalnum()) and op in s:
            if not s.startswith("("):
                m = re.search(re.escape(op) + r"[^\n(]*\((\d+)\)", s)
                if m:
                    ids.add(m.group(1))
                else:
                    n_no_id += 1
    return len(ids) + n_no_id


def has_operator(df: DataFrame, op: str) -> bool:
    return count_operator(df, op) > 0


def lambda_filters(df: DataFrame) -> int:
    """Filter nodes whose condition evaluates a HIGHER-ORDER-FUNCTION
    lambda (transform/aggregate/filter over an array) — almost always
    Catalyst's InferFiltersFromGenerate / constraint propagation
    duplicating an expensive computed-array expression into a pushed
    filter, where it re-runs per row ON TOP of the projection that
    computes it anyway. Round-8 case: the stop-shingle verify regroup's
    inferred ``size(shingles) > 0`` filter re-ran the whole
    normalize+transform shingle expression ~3x per candidate doc —
    20s vs 2s on a 1.5k-doc verify — until an InMemoryRelation
    boundary (pin before the explode) made the inferred filter a cheap
    array op on cached rows. A non-zero count here is a tripwire, not
    proof: inspect the filter and either pin below the Generate or
    restructure so the constraint lands on a plain column.

    Lines under an ``InMemoryRelation`` are EXCLUDED: a pinned
    subtree's internal filter runs once at materialization (and is
    auditable on the pinned frame itself), while the printed tree
    repeats it per reference — counting those made every pin look like
    a regression. Only the live plan above cache boundaries counts."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    n = 0
    skip_deeper_than = None  # indent of the InMemoryRelation we're under
    for line in plan.splitlines():
        indent = len(line) - len(line.lstrip(" :+-*"))
        if skip_deeper_than is not None:
            if indent > skip_deeper_than:
                continue
            skip_deeper_than = None
        s = line.lstrip(" :+-*")
        if s.startswith("InMemoryRelation"):
            skip_deeper_than = indent
            continue
        if s.startswith("Filter ") and "lambdafunction(" in s:
            n += 1
    return n


def plan_audit(df: DataFrame) -> dict:
    """One-call summary for eyeballing a plan in a REPL or asserting in
    tests: pushed filters, read schemas, shuffle count, join strategies,
    and the expensive-inferred-filter tripwire (``lambda_filters``)."""
    return {
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schemas(df),
        "n_shuffles": count_operator(df, "Exchange")
        - count_operator(df, "BroadcastExchange"),
        "n_broadcast_joins": count_operator(df, "BroadcastHashJoin"),
        "n_sortmerge_joins": count_operator(df, "SortMergeJoin"),
        "has_take_ordered": has_operator(df, "TakeOrderedAndProject"),
        "n_lambda_filters": lambda_filters(df),
    }


def observe_quality(df: DataFrame, name: str, metrics: dict | None = None):
    """Attach an in-flight metrics observation to ``df`` — production
    monitoring without a second scan: the metrics are accumulated
    DURING whatever action next runs the frame (the `df.observe`
    surface), so a 100 TB write also yields its row count and null
    tallies for free.

    ``metrics`` maps output name → aggregate Column; default is a row
    count. Returns (instrumented_df, observation); read
    ``observation.get`` AFTER an action has run.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    if metrics is None:
        metrics = {"n_rows": F.count(F.lit(1))}
    obs = Observation(name)
    cols = [v.alias(k) for k, v in metrics.items()]
    return df.observe(obs, *cols), obs
