"""Model-eval analytics (operators.model_eval): tie-aware AUC-ROC,
calibration bins, threshold confusion sweeps — each checked against a
hand-computable or pure-Python reference."""

import random

from pyspark.sql import functions as F

from databricks_flight_etl_spark.operators.model_eval import (
    auc_drift,
    auc_roc,
    calibration_bins,
    confusion_sweep,
    ece_drift,
)


def _auc_reference(pairs):
    """O(P·N) literal Mann-Whitney definition: mean over positive-
    negative pairs of [s_p > s_n] + 0.5·[s_p == s_n]."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    if not pos or not neg:
        return None
    u = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p in pos
        for n in neg
    )
    return u / (len(pos) * len(neg))


def test_auc_hand_example_with_ties(spark):
    # scores: pos {0.9, 0.5, 0.5}, neg {0.5, 0.1}
    # pairs: (.9>.5)=1 (.9>.1)=1 (.5==.5)=.5 (.5>.1)=1 (.5==.5)=.5 (.5>.1)=1
    # U = 5.0 -> AUC = 5 / (3*2) = 0.833333
    rows = [(0.9, 1), (0.5, 1), (0.5, 1), (0.5, 0), (0.1, 0)]
    df = spark.createDataFrame(rows, "s double, y int")
    got = auc_roc(df, "s", "y").first()
    assert got["auc"] == round(5.0 / 6.0, 6)
    assert (got["n_pos"], got["n_neg"]) == (3, 2)


def test_auc_matches_pairwise_reference_randomized(spark):
    rng = random.Random(11)
    # scores on a small grid to force plenty of ties
    pairs = [
        (rng.randrange(20) / 16.0, rng.randrange(2)) for _ in range(400)
    ]
    df = spark.createDataFrame(pairs, "s double, y int")
    got = auc_roc(df, "s", "y").first()["auc"]
    assert got == round(_auc_reference(pairs), 6)


def test_auc_degenerate_and_null_handling(spark):
    # single class -> NULL auc, counts still reported
    one = spark.createDataFrame([(0.3, 1), (0.7, 1)], "s double, y int")
    r = auc_roc(one, "s", "y").first()
    assert r["auc"] is None and (r["n_pos"], r["n_neg"]) == (2, 0)
    # null score / null label rows carry no evidence
    rows = [(0.9, 1), (None, 0), (0.1, None), (0.1, 0)]
    df = spark.createDataFrame(rows, "s double, y int")
    r = auc_roc(df, "s", "y").first()
    assert r["auc"] == 1.0 and (r["n_pos"], r["n_neg"]) == (1, 1)
    # empty
    r = auc_roc(df.limit(0), "s", "y").first()
    assert r["auc"] is None and (r["n_pos"], r["n_neg"]) == (0, 0)
    # perfect separation
    perf = spark.createDataFrame(
        [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)], "s double, y int"
    )
    assert auc_roc(perf, "s", "y").first()["auc"] == 1.0


def test_auc_partitioning_invariant(spark):
    """Integer rank-sum algebra: the statistic is identical under any
    physical layout (the repartition would perturb a sum-order-
    dependent float path)."""
    rng = random.Random(3)
    pairs = [(rng.randrange(64) / 64.0, rng.randrange(2)) for _ in range(300)]
    df = spark.createDataFrame(pairs, "s double, y int")
    a = auc_roc(df, "s", "y").first()["auc"]
    b = auc_roc(df.repartition(13), "s", "y").first()["auc"]
    assert a == b


def test_calibration_bins_hand_example(spark):
    # 4 rows in bin 0 ([0,.5) at n_bins=2): scores .25/.25/.0/.5? no —
    # 0.5 lands in bin 1. bin0: (0.25,1),(0.25,0),(0.0,0) ->
    # mean_score=1/6? use exact binary fractions: 0.25,0.25,0.0
    rows = [(0.25, 1), (0.25, 0), (0.0, 0), (0.5, 1), (1.0, 1)]
    df = spark.createDataFrame(rows, "s double, y int")
    got = {r["bin"]: r for r in calibration_bins(df, "s", "y", 2).collect()}
    assert set(got) == {0, 1}
    b0 = got[0]
    assert b0["n"] == 3
    assert b0["mean_score"] == round(0.5 / 3, 6)
    assert b0["frac_pos"] == round(1 / 3, 6)
    assert b0["gap"] == round(abs(1 / 3 - 0.5 / 3), 6)
    b1 = got[1]  # top bin right-closed: 1.0 stays in bin 1
    assert b1["n"] == 2 and b1["frac_pos"] == 1.0
    assert b1["mean_score"] == 0.75
    # out-of-range scores clamp into edge bins
    oob = spark.createDataFrame([(-0.5, 0), (1.5, 1)], "s double, y int")
    got = {r["bin"]: r["n"] for r in
           calibration_bins(oob, "s", "y", 4).collect()}
    assert got == {0: 1, 3: 1}


def test_confusion_sweep_matches_reference(spark):
    rng = random.Random(5)
    pairs = [(rng.randrange(16) / 16.0, rng.randrange(2)) for _ in range(200)]
    df = spark.createDataFrame(pairs, "s double, y int")
    ths = [0.0, 0.25, 0.5, 0.75, 1.0]
    got = {r["threshold"]: r for r in
           confusion_sweep(df, "s", "y", ths).collect()}
    for t in ths:
        tp = sum(1 for s, y in pairs if s >= t and y == 1)
        fp = sum(1 for s, y in pairs if s >= t and y == 0)
        fn = sum(1 for s, y in pairs if s < t and y == 1)
        tn = sum(1 for s, y in pairs if s < t and y == 0)
        r = got[t]
        assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (tp, fp, fn, tn)
        if tp + fp:
            assert r["precision"] == round(tp / (tp + fp), 6)
        else:
            assert r["precision"] is None
        if tp + fn:
            assert r["recall"] == round(tp / (tp + fn), 6)
        else:
            assert r["recall"] is None


def test_confusion_sweep_null_conventions(spark):
    # nothing predicted positive at t > max score -> precision NULL
    df = spark.createDataFrame([(0.1, 1), (0.2, 0)], "s double, y int")
    r = confusion_sweep(df, "s", "y", [0.9]).first()
    assert r["precision"] is None and r["f1"] is None
    assert r["recall"] == 0.0  # positives exist, none recalled
    # no positives at all -> recall NULL
    df = spark.createDataFrame([(0.9, 0), (0.2, 0)], "s double, y int")
    r = confusion_sweep(df, "s", "y", [0.5]).first()
    assert r["recall"] is None and r["f1"] is None
    assert r["precision"] == 0.0  # predictions exist, all wrong
    import pytest

    with pytest.raises(ValueError):
        confusion_sweep(df, "s", "y", [])
    with pytest.raises(ValueError):
        calibration_bins(df, "s", "y", 0)


def test_auc_continuous_scores_no_global_window(spark):
    """Continuous scores (distinct ≈ rows) must not funnel through an
    unpartitioned rank window — the plan rides _hist_cumsum's bucketed
    prefix-sum. Checked behaviorally (correct AUC on 5k distinct
    scores) and structurally (no unbounded single-partition Window in
    the plan over the score surface)."""
    n = 5000
    df = spark.range(n).select(
        (F.xxhash64("id").cast("double") / F.lit(2.0**63)).alias("s"),
        (F.col("id") % 3 == 0).cast("int").alias("y"),
    )
    rows = [(r["s"], r["y"]) for r in df.collect()]
    out = auc_roc(df, "s", "y")
    got = out.first()["auc"]
    assert got == round(_auc_reference(rows), 6)
    # structural: every window spec in the optimized plan carries a
    # partition expression — an UNpartitioned ordered spec leads with
    # its ordering expression, printed with ASC/DESC (same idiom as
    # test_vocab_coverage_full_curve_has_no_global_window)
    import re

    plan = out._jdf.queryExecution().optimizedPlan().toString()
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    for s in specs:
        head = s.split(",")[0].strip()
        assert "ASC" not in head and "DESC" not in head, plan


def test_auc_grouped_planted_separation_difference(spark):
    """by= computes each group's AUC independently, certified against
    the pairwise reference per group on data PLANTED with different
    separations: group 'clean' perfectly separable (AUC 1.0), group
    'noisy' anti-correlated on a slice (AUC well below), plus ties in
    both. Also pins row-per-group output ordered by the group column
    and that a group column name never collides with the internals."""
    rng = random.Random(23)
    rows = []
    # clean: every positive scores above every negative
    for i in range(40):
        rows.append(("clean", 0.8 + (i % 5) / 100.0, 1))
        rows.append(("clean", 0.2 + (i % 7) / 100.0, 0))
    # noisy: scores on a coarse grid, labels random -> heavy ties,
    # separation near 0.5 but exactly reproducible via the reference
    for _ in range(120):
        rows.append(("noisy", rng.choice([0.1, 0.3, 0.5, 0.7]),
                     rng.randint(0, 1)))
    df = spark.createDataFrame(rows, "g string, s double, y int")
    got = {r["g"]: r for r in auc_roc(df, "s", "y", by=["g"]).collect()}
    assert set(got) == {"clean", "noisy"}
    for g in ("clean", "noisy"):
        ref = _auc_reference(
            [(s, y) for gg, s, y in rows if gg == g]
        )
        assert got[g]["auc"] == round(ref, 6), g
    assert got["clean"]["auc"] == 1.0
    assert got["noisy"]["auc"] < 0.9  # genuinely different separation
    # grouped output is ordered by the group columns
    order = [r["g"] for r in auc_roc(df, "s", "y", by=["g"]).collect()]
    assert order == sorted(order)


def test_auc_grouped_single_class_group_null(spark):
    """A group with only one label class gets auc NULL but real
    counts; other groups are unaffected."""
    rows = [("a", 0.9, 1), ("a", 0.1, 0), ("b", 0.5, 1), ("b", 0.6, 1)]
    df = spark.createDataFrame(rows, "g string, s double, y int")
    got = {r["g"]: r for r in auc_roc(df, "s", "y", by=["g"]).collect()}
    assert got["a"]["auc"] == 1.0
    assert got["b"]["auc"] is None
    assert (got["b"]["n_pos"], got["b"]["n_neg"]) == (2, 0)


def test_calibration_and_sweep_grouped(spark):
    """by= slices calibration and the threshold sweep per group,
    each group's rows equal to the single-group call on that slice;
    output leads with the group columns, ordered."""
    rows = [("a", 0.25, 1), ("a", 0.75, 0), ("a", 0.75, 1),
            ("b", 0.25, 0), ("b", 0.25, 0), ("b", 1.0, 1)]
    df = spark.createDataFrame(rows, "g string, s double, y int")
    got = calibration_bins(df, "s", "y", 2, by=["g"]).collect()
    assert [r["g"] for r in got] == sorted(r["g"] for r in got)
    for g in ("a", "b"):
        whole = {(r["bin"], r["n"], r["mean_score"], r["frac_pos"])
                 for r in calibration_bins(
                     df.where(F.col("g") == g), "s", "y", 2).collect()}
        sliced = {(r["bin"], r["n"], r["mean_score"], r["frac_pos"])
                  for r in got if r["g"] == g}
        assert sliced == whole, g
    sweep = confusion_sweep(df, "s", "y", [0.5], by=["g"]).collect()
    by_g = {r["g"]: r for r in sweep}
    assert (by_g["a"]["tp"], by_g["a"]["fp"]) == (1, 1)
    assert (by_g["b"]["tp"], by_g["b"]["tn"]) == (1, 2)
    import pytest

    with pytest.raises(ValueError):
        confusion_sweep(df, "s", "y", [0.5], by=["g", "g"])
    with pytest.raises(ValueError):
        calibration_bins(df, "s", "y", 2, by=["__s"])


def test_by_rejects_reserved_and_score_label_names(spark):
    """r13 ADVICE: each metric rejects by columns that collide with its
    OWN staging/output names (not just __s/__y) and by columns equal to
    the score/label column — all at the call site, not as a confusing
    downstream AnalysisException."""
    import pytest

    rows = [("a", 0.25, 1), ("b", 0.75, 0)]
    df = spark.createDataFrame(rows, "g string, s double, y int")
    # per-caller reserved output names
    for by in (["threshold"], ["tp"], ["precision"]):
        with pytest.raises(ValueError, match="staging/output"):
            confusion_sweep(df.withColumnRenamed("g", by[0]),
                            "s", "y", [0.5], by=by)
    for by in (["bin"], ["n"], ["gap"]):
        with pytest.raises(ValueError, match="staging/output"):
            calibration_bins(df.withColumnRenamed("g", by[0]),
                             "s", "y", 2, by=by)
    for by in (["auc"], ["n_pos"], ["__cum___nn"]):
        with pytest.raises(ValueError, match="staging/output"):
            auc_roc(df.withColumnRenamed("g", by[0]), "s", "y", by=by)
    # by == score/label column is a call-site error, every sibling
    for fn in (
        lambda by: auc_roc(df, "s", "y", by=by),
        lambda by: calibration_bins(df, "s", "y", 2, by=by),
        lambda by: confusion_sweep(df, "s", "y", [0.5], by=by),
    ):
        with pytest.raises(ValueError, match="score/label"):
            fn(["s"])
        with pytest.raises(ValueError, match="score/label"):
            fn(["y"])
    # a reserved name elsewhere in the frame is fine when not in by
    assert auc_roc(df, "s", "y", by=["g"]).count() == 2


def test_reserved_sets_cover_actual_outputs(spark):
    """The hand-maintained per-metric reserved sets stay in sync with
    the metrics' ACTUAL output columns: every non-by output column
    must be reserved, so a future output column can't silently become
    a by= collision hole."""
    from databricks_flight_etl_spark.operators import model_eval as me

    df = spark.createDataFrame(
        [("a", 0.25, 1), ("a", 0.75, 0)], "g string, s double, y int"
    )
    cases = [
        (me._AUC_RESERVED, auc_roc(df, "s", "y", by=["g"])),
        (me._DRIFT_RESERVED, auc_drift(df, df, "s", "y", by=["g"])),
        (me._CALIBRATION_RESERVED,
         calibration_bins(df, "s", "y", 2, by=["g"])),
        (me._SWEEP_RESERVED,
         confusion_sweep(df, "s", "y", [0.5], by=["g"])),
        (me._ECE_RESERVED, ece_drift(df, df, "s", "y", 2, by=["g"])),
    ]
    for reserved, out in cases:
        extra = set(out.columns) - {"g"} - reserved
        assert not extra, f"output columns not reserved: {extra}"


def test_auc_drift_planted_regression(spark):
    """Grouped drift against the per-group pairwise reference: group
    'keep' identical in both runs (delta 0), group 'drop' has its
    candidate scores anti-correlated (auc_cand well below auc_base,
    delta = the rounded difference of the per-run references)."""
    base_rows, cand_rows = [], []
    for i in range(30):
        s_pos, s_neg = 0.7 + (i % 5) / 100.0, 0.3 + (i % 7) / 100.0
        for g in ("keep", "drop"):
            base_rows += [(g, s_pos, 1), (g, s_neg, 0)]
        cand_rows += [("keep", s_pos, 1), ("keep", s_neg, 0)]
        # candidate inverts the separation on 'drop'
        cand_rows += [("drop", s_neg, 1), ("drop", s_pos, 0)]
    b = spark.createDataFrame(base_rows, "g string, s double, y int")
    c = spark.createDataFrame(cand_rows, "g string, s double, y int")
    got = {r["g"]: r for r in auc_drift(b, c, "s", "y", by=["g"]).collect()}
    for g in ("keep", "drop"):
        rb = _auc_reference([(s, y) for gg, s, y in base_rows if gg == g])
        rc = _auc_reference([(s, y) for gg, s, y in cand_rows if gg == g])
        assert got[g]["auc_base"] == round(rb, 6), g
        assert got[g]["auc_cand"] == round(rc, 6), g
        assert got[g]["auc_delta"] == round(
            round(rc, 6) - round(rb, 6), 6
        ), g
    assert got["keep"]["auc_delta"] == 0.0
    assert got["drop"]["auc_delta"] < -0.5
    assert (got["keep"]["n_pos_base"], got["keep"]["n_pos_cand"]) == (30, 30)
    # ordered by the group column
    order = [r["g"] for r in auc_drift(b, c, "s", "y", by=["g"]).collect()]
    assert order == sorted(order)


def test_auc_drift_absent_and_single_class_slices(spark):
    """A slice absent from one run reports that side's auc AND counts
    NULL; a present-but-single-class slice reports auc NULL with real
    counts; delta NULL whenever either auc is."""
    b = spark.createDataFrame(
        [("a", 0.9, 1), ("a", 0.1, 0), ("gone", 0.8, 1), ("gone", 0.2, 0)],
        "g string, s double, y int",
    )
    c = spark.createDataFrame(
        [("a", 0.9, 1), ("a", 0.1, 0), ("one", 0.5, 1), ("one", 0.6, 1)],
        "g string, s double, y int",
    )
    got = {r["g"]: r for r in auc_drift(b, c, "s", "y", by=["g"]).collect()}
    assert set(got) == {"a", "gone", "one"}
    assert got["a"]["auc_delta"] == 0.0
    assert got["gone"]["auc_base"] == 1.0
    assert got["gone"]["auc_cand"] is None
    assert got["gone"]["n_pos_cand"] is None  # absent, not zero
    assert got["gone"]["auc_delta"] is None
    assert got["one"]["auc_cand"] is None  # single class
    assert (got["one"]["n_pos_cand"], got["one"]["n_neg_cand"]) == (2, 0)
    assert got["one"]["auc_delta"] is None


def _ece_reference(pairs, n_bins):
    """Literal Σ (n_b/N)·|frac_pos − mean_score| over clamped
    equi-width bins — the textbook form the sum form must equal."""
    import collections

    bins = collections.defaultdict(list)
    for s, y in pairs:
        bins[min(n_bins - 1, max(0, int(s * n_bins)))].append((s, y))
    n = len(pairs)
    return sum(
        (len(v) / n)
        * abs(
            sum(y for _, y in v) / len(v) - sum(s for s, _ in v) / len(v)
        )
        for v in bins.values()
    )


def test_ece_drift_matches_reference(spark):
    """Grouped ECE drift against the literal per-bin reference on
    planted data: group 'keep' identical in both runs (delta 0), group
    'worse' has candidate scores pushed away from the labels. Binary-
    fraction scores -> every cell exact."""
    base_rows, cand_rows = [], []
    for i in range(32):
        s = (i % 16) / 16.0
        y = 1 if i % 16 >= 8 else 0
        for g in ("keep", "worse"):
            base_rows.append((g, s, y))
        cand_rows.append(("keep", s, y))
        cand_rows.append(("worse", (15 - i % 16) / 16.0, y))
    b = spark.createDataFrame(base_rows, "g string, s double, y int")
    c = spark.createDataFrame(cand_rows, "g string, s double, y int")
    got = {r["g"]: r for r in ece_drift(b, c, "s", "y", 4, by=["g"]).collect()}
    for g in ("keep", "worse"):
        rb = _ece_reference(
            [(s, y) for gg, s, y in base_rows if gg == g], 4
        )
        rc = _ece_reference(
            [(s, y) for gg, s, y in cand_rows if gg == g], 4
        )
        assert got[g]["ece_base"] == round(rb, 6), g
        assert got[g]["ece_cand"] == round(rc, 6), g
        assert got[g]["ece_delta"] == round(rc - rb, 6), g
        assert (got[g]["n_base"], got[g]["n_cand"]) == (32, 32)
    assert got["keep"]["ece_delta"] == 0.0
    assert got["worse"]["ece_delta"] > 0.1


def test_ece_drift_absent_slice_and_global(spark):
    """Absent slice -> NULL side and NULL delta; no by= -> one global
    row; guards fire at the call site."""
    import pytest

    b = spark.createDataFrame(
        [("a", 0.25, 0), ("a", 0.75, 1), ("gone", 0.5, 1)],
        "g string, s double, y int",
    )
    c = spark.createDataFrame(
        [("a", 0.25, 0), ("a", 0.75, 1)], "g string, s double, y int"
    )
    got = {r["g"]: r for r in ece_drift(b, c, "s", "y", 2, by=["g"]).collect()}
    assert got["gone"]["ece_cand"] is None
    assert got["gone"]["n_cand"] is None
    assert got["gone"]["ece_delta"] is None
    assert got["a"]["ece_delta"] == 0.0
    r = ece_drift(b, c, "s", "y", 2).first()
    assert r["n_base"] == 3 and r["n_cand"] == 2
    with pytest.raises(ValueError, match="staging/output"):
        ece_drift(b, c, "s", "y", 2, by=["ece_base"])
    with pytest.raises(ValueError):
        ece_drift(b, c, "s", "y", 0)


def test_auc_drift_global_and_guards(spark):
    """No by= -> one global row; reserved/by-collision errors surface
    at the call site."""
    import pytest

    b = spark.createDataFrame(
        [(0.9, 1), (0.1, 0)], "s double, y int"
    )
    c = spark.createDataFrame(
        [(0.1, 1), (0.9, 0)], "s double, y int"
    )
    r = auc_drift(b, c, "s", "y").first()
    assert (r["auc_base"], r["auc_cand"], r["auc_delta"]) == (1.0, 0.0, -1.0)
    g = spark.createDataFrame(
        [("x", 0.9, 1)], "auc_base string, s double, y int"
    )
    with pytest.raises(ValueError, match="staging/output"):
        auc_drift(g, g, "s", "y", by=["auc_base"])
    with pytest.raises(ValueError, match="score/label"):
        auc_drift(b, c, "s", "y", by=["s"])
