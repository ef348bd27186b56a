"""Q5 validity: rule engine over boolean column predicates.

Reference site: NB:313–352 — ``check_validity(df, column, condition,
message)`` prints rows failing ``~condition`` for 10 range/positivity
rules. Semantics preserved exactly:

- **Report-only**: failing rows are never removed (the one observed
  failure, CRSDepTime=0, flows into the output — DBC[19]).
- **Nulls pass silently**: ``~cond`` on NULL is NULL, which a filter
  does not select (three-valued logic, SURVEY §2.2 P4).

Improvement over the reference: the reference runs one filter+count scan
per rule (≥10 scans, 20.5 s); ``check_rules`` evaluates every rule in a
single aggregate pass.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["Rule", "failures", "check_rules", "range_rule"]


@dataclass(frozen=True)
class Rule:
    """A validity rule: rows where ``condition`` is not True fail…
    except NULL evaluations, which pass (reference P4 semantics)."""

    name: str
    condition: Column
    message: str = ""


def range_rule(name: str, col: str, lo, hi) -> Rule:
    """The reference's dominant rule shape: ``lo <= col <= hi``
    (NB:325–352)."""
    c = F.col(col)
    return Rule(name, (c >= lo) & (c <= hi), f"{col} must be in [{lo}, {hi}]")


def failures(df: DataFrame, rule: Rule) -> DataFrame:
    """Rows failing the rule — reference NB:317 ``df.filter(~condition)``.
    NULL condition rows are NOT selected (null-pass)."""
    return df.filter(~rule.condition)


def check_rules(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Report DataFrame (rule, n_fail): failure count per rule, computed
    in ONE scan. ``when(~cond, 1).otherwise(0)`` maps NULL→0 exactly like
    the filter-based per-rule path (NULL never fails)."""
    aggs = [
        F.sum(F.when(~r.condition, 1).otherwise(0)).alias(r.name) for r in rules
    ]
    wide = df.agg(*aggs)
    stack = "stack({n}, {args}) as (rule, n_fail)".format(
        n=len(rules), args=", ".join(f"'{r.name}', `{r.name}`" for r in rules)
    )
    return wide.select(F.expr(stack)).select(
        "rule", F.coalesce(F.col("n_fail"), F.lit(0)).cast("bigint").alias("n_fail")
    )
