"""End-to-end quality pipeline — the reference notebook as one
composable, cached, single-pass-per-stage flow.

The reference (NB:1–445) runs ingest → completeness → accuracy →
consistency → uniqueness → derive-timestamp → validity → timeliness →
write, re-scanning the source CSV for every action (~10+ full scans —
its dominant cost, SURVEY §3). Here the cleaned DataFrame is persisted
once and every profile fans out from it (SURVEY §4.3 "cache once, fan
out"); at 100 TB substitute a parquet/Delta checkpoint for the persist.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

from .functions import derive_departure_timestamp
from .operators import (
    completeness,
    consistency,
    timeliness,
    uniqueness,
    validity,
)
from .sources import write_parquet

__all__ = ["QualityReport", "run_flight_pipeline"]


@dataclass
class QualityReport:
    """All quality-check outputs as DataFrames (lazy until collected)."""

    cleaned: DataFrame
    dropped_columns: list[str]
    null_profile: DataFrame
    value_frequencies: DataFrame
    exact_dup_groups: DataFrame
    key_dup_groups: DataFrame | None
    validity: DataFrame | None
    day_coverage: DataFrame | None
    output_partitions: int = -1
    extras: dict = field(default_factory=dict)


def run_flight_pipeline(
    df: DataFrame,
    dedup_keys: list[str] | None = None,
    rules: list[validity.Rule] | None = None,
    derive_ts: bool = True,
    ts_col: str = "DepTime_Timestamp",
    output_path: str | None = None,
    persist: bool = True,
) -> QualityReport:
    """Run the full reference pipeline shape over a flight-schema (or
    compatible) DataFrame. Every report is a DataFrame; nothing prints.

    Stages (reference cell order, SURVEY §2.10):
      Q1 drop all-null columns + null profile → Q3 value frequencies →
      Q7 timestamp derive → Q4 exact + compound-key duplicate groups →
      Q5 validity report (report-only; rows never dropped) →
      Q6 day coverage on the derived timestamp → optional sized write.
    """
    cleaned, dropped = completeness.drop_allnull_columns(df)
    if derive_ts and "DepTime" in cleaned.columns:
        cleaned = derive_departure_timestamp(cleaned)
    if persist:
        cleaned = cleaned.persist(StorageLevel.MEMORY_AND_DISK)

    report = QualityReport(
        cleaned=cleaned,
        dropped_columns=dropped,
        null_profile=completeness.null_profile(cleaned),
        value_frequencies=consistency.value_frequencies(cleaned),
        exact_dup_groups=uniqueness.duplicate_groups(cleaned),
        key_dup_groups=(
            uniqueness.key_duplicate_groups(cleaned, dedup_keys)
            if dedup_keys
            else None
        ),
        validity=validity.check_rules(cleaned, rules) if rules else None,
        day_coverage=(
            timeliness.day_coverage(cleaned, ts_col)
            if ts_col in cleaned.columns
            else None
        ),
    )
    if output_path is not None:
        report.output_partitions = write_parquet(cleaned, output_path)
    return report
