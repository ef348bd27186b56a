"""Privacy / re-identification QA over tabular releases: k-anonymity
and l-diversity (Sweeney 2002; Machanavajjhala et al. 2007 — the
standard published definitions, re-expressed as Spark aggregates).

Complements the text-side PII redaction (text.pii_redact): that strips
direct identifiers from free text; these measure whether the STRUCTURED
columns of a released table still single people out. Both checks are
one hash aggregate keyed on the quasi-identifier tuple — linear, one
shuffle, no windows — so they run casually on any release candidate.

At 100 TB the equivalence-class aggregate is the same shape as any
group-by profile: partial aggregation map-side, the class table is
bounded by the quasi-identifier cardinality (the thing k-anonymity is
ABOUT — if it approaches the row count the table is nowhere near
anonymous), and the suppression join broadcasts the violating-class
list when small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "k_anonymity_report",
    "k_anonymize",
    "l_diversity_report",
]


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Equivalence classes (unique quasi-identifier combinations) with
    fewer than ``k`` members — each is a re-identification risk: an
    attacker who knows someone's quasi-identifiers narrows them to
    < k candidates. Output (quasi…, class_size), the violating classes
    only. Empty result == the table IS k-anonymous."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .where(F.col("class_size") < k)
    )


def k_anonymize(
    df: DataFrame, quasi_cols: list[str], k: int = 5,
    broadcast_max_rows: int = 8_000_000,
) -> DataFrame:
    """Suppression-mode k-anonymization: drop every row whose
    quasi-identifier class has fewer than ``k`` members (the standard
    baseline before reaching for generalization hierarchies). Returns
    the surviving rows, schema unchanged.

    Plan: the violating-class list from :func:`k_anonymity_report` is
    left-anti-joined on the quasi columns; the list is size-gated for
    broadcast (it is bounded by the class-table cardinality, but a
    near-unique quasi tuple makes it corpus-sized — the gate keeps the
    hint honest, mirroring dedup_survivors)."""
    bad = k_anonymity_report(df, quasi_cols, k).select(*quasi_cols)
    if broadcast_max_rows and bad.count() <= broadcast_max_rows:
        bad = F.broadcast(bad)
    return df.join(bad, quasi_cols, "left_anti")


def l_diversity_report(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str,
    l: int = 2,  # noqa: E741 - the literature's own letter
) -> DataFrame:
    """Equivalence classes whose SENSITIVE attribute takes fewer than
    ``l`` distinct values — k-anonymity's blind spot: a class of 50
    people is useless to an attacker for identity, but if all 50 share
    one diagnosis, membership alone discloses it (homogeneity attack).
    Output (quasi…, class_size, n_distinct_sensitive), violating
    classes only; distinct-l-diversity, the base variant."""
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.count_distinct(F.col(sensitive_col))
            .alias("n_distinct_sensitive"),
        )
        .where(F.col("n_distinct_sensitive") < l)
    )
