"""Deterministic sampling for training-data pipelines (SURVEY §2.11
extension surface; the reference has no sampling operator).

``df.sample``/``sampleBy`` draw from a seeded RNG whose stream depends
on partitioning — rerun the job with a different split of the input and
you get a different sample. Pipelines that must be reproducible (and
auditable: "why is this row in the training set?") sample by CONTENT
hash instead: a row is kept iff a hex prefix of md5(key) falls below
the fraction's threshold. Properties:

- deterministic across runs, partitionings, and engines (md5 is md5
  everywhere — the DuckDB oracle certifies value-for-value parity);
- stable under incremental loads: a row's keep/drop decision never
  changes as other rows arrive, so yesterday's sample is a subset of
  today's (the property that makes downsampled corpora diffable);
- per-row and shuffle-free: a narrow filter, pushable next to the scan.

The threshold compares md5 hex PREFIXES as strings — no hex→int parse,
which keeps the predicate expressible in any SQL dialect. With 12 hex
chars the fraction granularity is 16⁻¹² ≈ 3.6e-15.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_bucket", "deterministic_sample", "stratified_sample"]

_PREFIX_LEN = 12


def _threshold_hex(fraction: float) -> str:
    """String T such that P(md5-prefix < T) == fraction (to 16⁻¹²).
    Fraction 1.0 returns "g", which every hex string sorts below."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    scaled = int(round(fraction * (16 ** _PREFIX_LEN)))
    if scaled >= 16 ** _PREFIX_LEN:
        return "g"
    return format(scaled, f"0{_PREFIX_LEN}x")


def hash_bucket(key: Column | str, salt: str = "") -> Column:
    """The sampling coordinate: first 12 hex chars of md5(salt ‖ key).
    Change ``salt`` to draw an independent sample from the same corpus
    (e.g. train vs holdout splits that must not correlate)."""
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1,
                       _PREFIX_LEN)


def deterministic_sample(
    df: DataFrame, key: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep the rows whose hash bucket falls below the fraction
    threshold — an exact, rerun-stable Bernoulli(fraction) sample keyed
    on ``key``'s content."""
    return df.where(hash_bucket(key, salt) < F.lit(_threshold_hex(fraction)))


def stratified_sample(
    df: DataFrame, strata_col: str, key: str,
    fractions: dict[str, float], default: float = 0.0, salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing knob of a
    training-data pipeline (e.g. keep 100% of wiki, 10% of crawl).
    Rows in strata missing from ``fractions`` keep with ``default``.
    Same content-hash coordinate as deterministic_sample, so strata
    rates can be retuned without reshuffling previously kept rows."""
    thr = F.lit(_threshold_hex(default))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == value, F.lit(_threshold_hex(frac))
        ).otherwise(thr)
    return df.where(hash_bucket(key, salt) < thr)
