"""Classifier-quality analytics at corpus scale (X12): AUC-ROC,
calibration / expected calibration error, and threshold confusion
sweeps.

A training-data pipeline gates documents with model scores —
fasttext-style quality classifiers, LM perplexity filters, toxicity
scorers (cf. text.linear_score_documents / text.ngram_lm_score, which
PRODUCE such scores). Validating a filter over millions of scored
rows is itself a distributed-analytics problem: AUC needs a global
rank statistic over a continuous score column (distinct ≈ rows — the
exact regime where a naive unpartitioned rank window collapses onto
one task), and calibration needs weighted per-bin aggregates.
Everything here is groupBy/window algebra on the JVM; no per-row
Python anywhere.

Scale shape: one hash-agg histogram per call (map-side partial, keyed
on the score value), then either the shared two-level range-bucket
prefix-sum (`accuracy._hist_cumsum` — no task ever holds the distinct-
score surface) for AUC, or a bounded n_bins/n_thresholds aggregate for
calibration/sweeps. At 100 TB the histogram IS the scan; everything
after it is sketch-sized.

Exactness discipline (oracle-certifiable): AUC's rank-sum is carried
as INTEGER 2U (the tie term 0.5·n_neg(s) is folded by doubling), so
any engine reproduces the statistic bit-for-bit up to one final
rounded division; calibration sums doubles, which is exact whenever
scores are binary fractions (k/2^m — the harness queries derive
scores that way; arbitrary float scores are still correct, just
last-ulp sensitive to sum order like any float aggregate).

Deliberately ABSENT: PR-AUC / average precision. AP sums per-group
precision RATIOS (cum_tp/(cum_tp+cum_fp) per distinct score) — a sum
of non-binary float quotients whose result depends on summation
order, so it cannot meet the exact-cell oracle bar the way 2U can
(no common denominator folds it to integers). The precision/recall
surface is available exactly instead: confusion_sweep at any
threshold grid IS the PR curve's operating points, each cell a single
rounded division of exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "auc_drift",
    "auc_roc",
    "calibration_bins",
    "confusion_sweep",
    "ece_drift",
]


# Per-metric reserved name sets for _checked_by: every staging and
# output column the metric introduces, so a colliding by= column fails
# at the call site. Hand-maintained BESIDE the implementations below —
# tests/test_model_eval.py asserts each metric's actual output columns
# are covered, so adding an output column without extending its set is
# a red test, not a silent hole.
_AUC_RESERVED = frozenset(
    {"__np", "__nn", "__2u", "__bkt", "__cum___nn", "__cum___np",
     "auc", "n_pos", "n_neg"}
)
_DRIFT_RESERVED = _AUC_RESERVED | frozenset(
    {"__run", "auc_base", "auc_cand", "auc_delta", "n_pos_base",
     "n_neg_base", "n_pos_cand", "n_neg_cand"}
)
_CALIBRATION_RESERVED = frozenset(
    {"bin", "n", "mean_score", "frac_pos", "gap"}
)
_ECE_RESERVED = frozenset(
    {"__run", "__bin", "__sy", "__ss", "__n", "__ece", "__nr",
     "ece_base", "ece_cand", "ece_delta", "n_base", "n_cand"}
)
_SWEEP_RESERVED = frozenset(
    {"threshold", "__tp", "__fp", "__fn", "__tn",
     "tp", "fp", "fn", "tn", "precision", "recall", "f1"}
)


def _checked_by(
    by: list[str] | None,
    reserved: frozenset[str],
    score_col: str,
    label_col: str,
) -> list[str]:
    """Validate grouped-metric group columns at the call site: no
    collision with the caller's staging/output names (``reserved``,
    which always includes _scored's __s/__y — a ``by`` named
    'threshold' or 'bin' or 'auc' would otherwise surface as a
    duplicate/ambiguous column in a confusing downstream
    AnalysisException, r13 ADVICE), no duplicates, and not the score
    or label column itself (those are consumed into __s/__y, so
    grouping on them would silently group per-score/per-label)."""
    by = list(by or [])
    if bad := ({"__s", "__y"} | reserved) & set(by):
        raise ValueError(
            f"by columns {sorted(bad)} collide with this metric's "
            f"staging/output column names; rename them before calling"
        )
    if bad := {score_col, label_col} & set(by):
        raise ValueError(
            f"by columns {sorted(bad)} are the score/label column — "
            f"group columns must be distinct from them"
        )
    if len(set(by)) != len(by):
        raise ValueError(f"duplicate by columns: {by}")
    return by


def _scored(
    df: DataFrame,
    score_col: str,
    label_col: str,
    by: list[str] | None = None,
) -> DataFrame:
    """Rows usable for ranking metrics: score AND label non-null, label
    coerced to {0,1} int (nulls pass through neither as 0 nor 1 —
    unlabeled rows carry no evidence, same convention as the validity
    operators' three-valued logic). ``by`` columns ride along for
    grouped metrics."""
    return df.where(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        *[F.col(c) for c in (by or [])],
        F.col(score_col).cast("double").alias("__s"),
        (F.col(label_col).cast("int") != 0).cast("int").alias("__y"),
    )


def auc_roc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    by: list[str] | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Area under the ROC curve via the Mann-Whitney U rank statistic,
    tie-aware: AUC = Σ_s n_pos(s)·(N_neg(<s) + ½·n_neg(s)) / (P·N).

    Distributed shape: ONE histogram hash-agg over the score column
    (n_pos, n_neg per distinct score), then the shared two-level
    prefix-sum for the exclusive negative-count cumulative — a
    continuous score (distinct ≈ rows) spreads over n_buckets ×
    shuffle partitions instead of one global rank window. The ½ tie
    term is folded into integers by doubling (2U = Σ n_pos·(2·cum +
    n_neg)), so the statistic is exact integer algebra until the one
    final division.

    ``by`` computes a PER-GROUP AUC (per domain / per language — did
    the quality classifier hold up on each slice, r12 verdict task
    #5): the histogram keys on (by…, score) and ``_hist_cumsum``'s
    native ``by=`` scopes the prefix-sum per group, so the whole thing
    stays two hash-aggs + the shared bucketed window — no per-group
    driver loop, no unpartitioned window, group count unbounded.

    Returns ONE row (auc, n_pos, n_neg) — or one per ``by`` group,
    ordered by the group columns, groups where score or label was all
    null absent (no evidence, same as _scored's row filter). Empty
    input or a single class present → auc NULL (undefined), counts
    still reported."""
    from .accuracy import _hist_cumsum

    by = _checked_by(by, _AUC_RESERVED, score_col, label_col)
    hist = (
        _scored(df, score_col, label_col, by)
        .groupBy(*by, "__s")
        .agg(
            F.sum("__y").alias("__np"),
            F.sum(1 - F.col("__y")).alias("__nn"),
        )
    )
    # __np rides along as a second sum column because _hist_cumsum
    # projects to (value, sum_cols, cums) — its cumulative is unused
    cum = _hist_cumsum(hist, "__s", ["__nn", "__np"], by=by, inclusive=False)
    aggs = [
        F.coalesce(
            F.sum(
                F.col("__np")
                * (F.lit(2) * F.col("__cum___nn") + F.col("__nn"))
            ),
            F.lit(0),
        ).alias("__2u"),
        F.coalesce(F.sum("__np"), F.lit(0)).alias("n_pos"),
        F.coalesce(F.sum("__nn"), F.lit(0)).alias("n_neg"),
    ]
    parts = cum.groupBy(*by).agg(*aggs) if by else cum.agg(*aggs)
    out = parts.select(
        *by,
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(
                F.col("__2u")
                / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg")),
                decimals,
            ),
        ).alias("auc"),
        "n_pos",
        "n_neg",
    )
    return out.orderBy(*by) if by else out


def auc_drift(
    base: DataFrame,
    cand: DataFrame,
    score_col: str,
    label_col: str,
    *,
    by: list[str] | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Per-slice AUC drift between two scoring runs — the "did the new
    quality filter regress any language" gate: baseline vs candidate
    AUC side by side with their delta, one row per ``by`` group (or
    one global row). The natural companion of the PSI/KS drift
    operators, but on the DISCRIMINATION statistic rather than the
    score distribution: a scorer can keep its score histogram and
    still lose ranking power on a slice.

    Distributed shape: the two runs union under a literal ``__run``
    tag and flow through ONE :func:`auc_roc` pass with ``by`` extended
    by the tag — a single histogram keyed on (run, by…, score) and one
    shared bucketed prefix-sum scoped per (run, group), then a bounded
    ≤ 2-rows-per-group pivot. Both inputs are scanned exactly once;
    no join of per-run aggregates, no second cumulative.

    Output: (by…, auc_base, auc_cand, auc_delta, n_pos_base,
    n_neg_base, n_pos_cand, n_neg_cand), ordered by the group columns.
    auc_delta = round(auc_cand − auc_base) and is NULL when either
    side's AUC is undefined (single-class or absent slice — 0-evidence
    is unknowable, not 0, the validity-operator convention). A slice
    with NO usable rows in one run reports that side's auc AND counts
    as NULL — absence is distinguishable from a present-but-one-class
    slice (auc NULL, counts real)."""
    by = _checked_by(by, _DRIFT_RESERVED, score_col, label_col)
    if "__run" in (score_col, label_col):
        raise ValueError(
            "score/label column may not be named __run — it is the "
            "internal run tag"
        )
    cols = [*by, score_col, label_col]
    tagged = (
        base.select(*cols)
        .withColumn("__run", F.lit(0))
        .unionByName(cand.select(*cols).withColumn("__run", F.lit(1)))
    )
    per = auc_roc(
        tagged, score_col, label_col, by=[*by, "__run"], decimals=decimals
    )

    def _side(run: int, col: str):
        return F.max(F.when(F.col("__run") == run, F.col(col)))

    aggs = [
        _side(0, "auc").alias("auc_base"),
        _side(1, "auc").alias("auc_cand"),
        _side(0, "n_pos").alias("n_pos_base"),
        _side(0, "n_neg").alias("n_neg_base"),
        _side(1, "n_pos").alias("n_pos_cand"),
        _side(1, "n_neg").alias("n_neg_cand"),
    ]
    wide = per.groupBy(*by).agg(*aggs) if by else per.agg(*aggs)
    out = wide.select(
        *by,
        "auc_base",
        "auc_cand",
        F.round(F.col("auc_cand") - F.col("auc_base"), decimals)
        .alias("auc_delta"),
        "n_pos_base",
        "n_neg_base",
        "n_pos_cand",
        "n_neg_cand",
    )
    return out.orderBy(*by) if by else out


def _clamped_bin(n_bins: int):
    """Equi-width bin index on [0, 1] over the staged __s column, out-
    of-range scores clamped into the edge bins. Clamp on the LongType
    floor FIRST, cast to int LAST: with ANSI off, casting an extreme
    score's floor (|s·n_bins| > 2^31) to int wraps, so a huge positive
    score could land in bin 0 instead of the top edge bin the
    calibration docstring promises (r12 ADVICE)."""
    return F.greatest(
        F.lit(0),
        F.least(
            F.lit(n_bins - 1),
            F.floor(F.col("__s") * n_bins),
        ),
    ).cast("int")


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    *,
    decimals: int = 6,
    by: list[str] | None = None,
) -> DataFrame:
    """Reliability table over equi-width score bins on [0, 1]: per bin
    (bin, n, mean_score, frac_pos, gap) with gap = |frac_pos −
    mean_score| — the summand of expected calibration error; ECE is
    Σ (n/N)·gap, recoverable from this table in one more agg (the
    harness certifies the TABLE, the finer artifact). Scores outside
    [0, 1] clamp into the edge bins (a miscalibrated-by-construction
    scorer still lands somewhere); the right-closed top bin keeps
    score = 1.0 in bin n_bins−1.

    One bounded hash-agg: ≤ n_bins output rows regardless of corpus
    size (× group count with ``by`` — per-slice reliability, same
    single agg keyed on (by…, bin)). Empty bins are absent (report
    joins against observed data, not a bin spine — callers needing a
    dense axis can generate one)."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    by = _checked_by(by, _CALIBRATION_RESERVED, score_col, label_col)
    s = _scored(df, score_col, label_col, by)
    b = _clamped_bin(n_bins)
    return (
        s.groupBy(*by, b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("__s"), decimals).alias("mean_score"),
            F.round(F.avg("__y"), decimals).alias("frac_pos"),
            F.round(F.abs(F.avg("__y") - F.avg("__s")), decimals)
            .alias("gap"),
        )
        .orderBy(*by, "bin")
    )


def ece_drift(
    base: DataFrame,
    cand: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    *,
    by: list[str] | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Per-slice expected-calibration-error drift between two scoring
    runs — the calibration face of :func:`auc_drift` ("did the new
    scorer stay calibrated on each language"). ECE is computed in its
    SUM form, ECE = Σ_bins |Σ label − Σ score| / N (algebraically
    identical to the usual Σ (n_b/N)·|frac_pos_b − mean_score_b|, but
    every summand is an exact value when scores are binary fractions —
    an integer label sum minus an exact score sum — so the statistic
    is certifiable cell-for-cell, not last-ulp sensitive like a sum of
    per-bin RATIOS would be).

    Distributed shape: the two runs union under a literal ``__run``
    tag, then ONE bounded hash-agg keyed on (by…, run, bin) — ≤
    groups·2·n_bins rows — and a second ≤ groups·2-row fold + pivot.
    Both inputs are scanned exactly once.

    Output: (by…, ece_base, ece_cand, ece_delta, n_base, n_cand),
    ordered by the group columns; a slice with no usable rows in one
    run reports that side's ece AND count as NULL (absence, not 0),
    and ece_delta is NULL when either side is."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    by = _checked_by(by, _ECE_RESERVED, score_col, label_col)
    if "__run" in (score_col, label_col):
        raise ValueError(
            "score/label column may not be named __run — it is the "
            "internal run tag"
        )
    cols = [*by, score_col, label_col]
    tagged = (
        base.select(*cols)
        .withColumn("__run", F.lit(0))
        .unionByName(cand.select(*cols).withColumn("__run", F.lit(1)))
    )
    s = _scored(tagged, score_col, label_col, [*by, "__run"])
    bins = s.groupBy(*by, "__run", _clamped_bin(n_bins).alias("__bin")).agg(
        F.sum("__y").alias("__sy"),
        F.sum("__s").alias("__ss"),
        F.count(F.lit(1)).alias("__n"),
    )
    per = bins.groupBy(*by, "__run").agg(
        (F.sum(F.abs(F.col("__sy") - F.col("__ss"))) / F.sum("__n"))
        .alias("__ece"),
        F.sum("__n").alias("__nr"),
    )

    def _side(run: int, col: str):
        return F.max(F.when(F.col("__run") == run, F.col(col)))

    aggs = [
        F.round(_side(0, "__ece"), decimals).alias("ece_base"),
        F.round(_side(1, "__ece"), decimals).alias("ece_cand"),
        F.round(_side(1, "__ece") - _side(0, "__ece"), decimals)
        .alias("ece_delta"),
        _side(0, "__nr").alias("n_base"),
        _side(1, "__nr").alias("n_cand"),
    ]
    wide = per.groupBy(*by).agg(*aggs) if by else per.agg(*aggs)
    return wide.orderBy(*by) if by else wide


def confusion_sweep(
    df: DataFrame,
    score_col: str,
    label_col: str,
    thresholds: list[float],
    *,
    decimals: int = 6,
    by: list[str] | None = None,
) -> DataFrame:
    """Confusion counts + precision/recall/F1 at EVERY threshold in one
    corpus pass: predicted positive iff score ≥ t. The thresholds ride
    in as a broadcast literal array (posexplode), so the plan is one
    projection + one ≤ len(thresholds)-group hash-agg — sweeping 100
    operating points costs the same scan as sweeping one.

    Precision is NULL when nothing is predicted positive, recall NULL
    when there are no positives (0/0 is unknowable, not 0 — validity-
    operator convention); F1 NULL when either is. Output ordered by
    threshold (``by`` groups lead the key and the sort — per-slice
    operating points, still the one ≤ groups·len(thresholds)-row
    hash-agg)."""
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    by = _checked_by(by, _SWEEP_RESERVED, score_col, label_col)
    s = _scored(df, score_col, label_col, by)
    t = F.explode(
        F.array(*[F.lit(float(x)) for x in thresholds])
    ).alias("threshold")
    pred = (F.col("__s") >= F.col("threshold")).cast("int")
    agg = (
        s.select(*by, "__s", "__y", t)
        .select(
            *by,
            "threshold",
            (pred * F.col("__y")).alias("__tp"),
            (pred * (1 - F.col("__y"))).alias("__fp"),
            ((1 - pred) * F.col("__y")).alias("__fn"),
            ((1 - pred) * (1 - F.col("__y"))).alias("__tn"),
        )
        .groupBy(*by, "threshold")
        .agg(
            F.sum("__tp").alias("tp"),
            F.sum("__fp").alias("fp"),
            F.sum("__fn").alias("fn"),
            F.sum("__tn").alias("tn"),
        )
    )
    precision = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp") / (F.col("tp") + F.col("fp")),
    )
    recall = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp") / (F.col("tp") + F.col("fn")),
    )
    f1 = F.when(
        precision.isNotNull()
        & recall.isNotNull()
        & (precision + recall > 0),
        2 * precision * recall / (precision + recall),
    )
    return agg.select(
        *by,
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(precision, decimals).alias("precision"),
        F.round(recall, decimals).alias("recall"),
        F.round(f1, decimals).alias("f1"),
    ).orderBy(*by, "threshold")
