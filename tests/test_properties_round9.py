"""Round-9 checks: the default-on LSH pre-flight entropy guard, the
corpus-relative max_df_frac knob, caller-supplied stop lists (the
100 TB no-cache path), the bounded output='clusters' option, the
ANSI-mode-stable shingle_df_profile contract, the observer-read final
layout re-check, and the bg_jaccard_est ≡ micro-averaged-pairwise-
Jaccard identity (round-8 VERDICT tasks #2/#3/#6-#8 + ADVICE items)."""

import math
import os

import pytest
from pyspark.sql import functions as F

from databricks_flight_etl_spark.operators import dedup


def _boiler_corpus(spark, n=40):
    """Low-entropy corpus: every doc dominated by the same boilerplate
    prefix — the round-8 quadratic-LSH regime (bg_jaccard ≫ 0.01)."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("breaking news subscribe to our newsletter today "
                  "all rights reserved terms of service apply here "),
            F.col("id").cast("string"),
        ).alias("text"),
    )


def _diverse_corpus(spark, n=40):
    """High-entropy corpus: per-doc unique hash tokens, background
    Jaccard ≈ 0 — the guard must stay silent on it."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.conv(F.hex(F.xxhash64(F.col("id"), F.lit(i))), 16, 36)
              for i in range(12)],
        ).alias("text"),
    )


# ---------------------------------------------------------------- #
# VERDICT task #2 — default-on pre-flight entropy guard            #
# ---------------------------------------------------------------- #

def test_guard_raises_on_boilerplate_corpus_naming_knob(spark):
    """An unmitigated run on a corpus whose profile predicts quadratic
    LSH must fail fast under guard='raise', and the message must name
    the mitigation knob (max_df) and the measured J_bg."""
    docs = _boiler_corpus(spark)
    with pytest.raises(ValueError) as ei:
        dedup.minhash_dedup_pairs(
            docs, "text", "doc_id", shingle_k=7, guard="raise"
        )
    msg = str(ei.value)
    assert "max_df" in msg and "bg_jaccard_est" in msg
    # simhash face of the same guard
    with pytest.raises(ValueError, match="max_df"):
        dedup.simhash_near_dup_pairs(
            docs, "text", "doc_id", shingle_k=7, guard="raise"
        )


def test_guard_warns_by_default_and_mitigation_silences_it(spark):
    """Default guard='warn': a RuntimeWarning on the low-entropy
    corpus, silence on the high-entropy one, silence when max_df (any
    form) or stops= is supplied — a mitigated call never runs the
    guard — and identical results with the guard on or off."""
    boiler, diverse = _boiler_corpus(spark), _diverse_corpus(spark)
    with pytest.warns(RuntimeWarning, match="bg_jaccard_est"):
        warned = dedup.minhash_dedup_pairs(
            boiler, "text", "doc_id", shingle_k=7
        )
    import warnings as w

    with w.catch_warnings():
        w.simplefilter("error", RuntimeWarning)  # any guard warning fails
        dedup.minhash_dedup_pairs(diverse, "text", "doc_id", shingle_k=7)
        dedup.minhash_dedup_pairs(
            boiler, "text", "doc_id", shingle_k=7, max_df=5
        )
        dedup.minhash_dedup_pairs(
            boiler, "text", "doc_id", shingle_k=7, max_df_frac=0.2
        )
        stops = dedup.shingle_stop_list(
            boiler, "text", "doc_id", shingle_k=7, max_df=5
        )
        dedup.minhash_dedup_pairs(
            boiler, "text", "doc_id", shingle_k=7, stops=stops
        )
        off = dedup.minhash_dedup_pairs(
            boiler, "text", "doc_id", shingle_k=7, guard="off"
        )
    assert sorted(map(tuple, warned.collect())) == sorted(
        map(tuple, off.collect())
    )
    with pytest.raises(ValueError, match="guard"):
        dedup.minhash_dedup_pairs(
            boiler, "text", "doc_id", shingle_k=7, guard="loud"
        )


# ---------------------------------------------------------------- #
# VERDICT task #3 — corpus-relative max_df_frac                    #
# ---------------------------------------------------------------- #

def test_max_df_frac_resolution_and_equivalence(spark):
    """max_df_frac resolves to ceil(frac·n_docs) over NON-NULL texts
    and produces bit-identical results to the equivalent absolute
    max_df, for minhash, simhash and shingle_stop_list."""
    docs = _boiler_corpus(spark, n=40)
    with_null = docs.unionByName(
        spark.createDataFrame([(999, None)], "doc_id long, text string")
    )
    # 40 non-null docs: frac 0.27 → ceil(10.8) = 11
    assert dedup.resolve_max_df(with_null, "text", max_df_frac=0.27) == 11
    assert dedup.resolve_max_df(docs, "text", max_df_frac=1e-9) == 1
    assert dedup.resolve_max_df(docs, "text", max_df=7) == 7
    assert dedup.resolve_max_df(docs, "text") is None
    with pytest.raises(ValueError, match="not both"):
        dedup.resolve_max_df(docs, "text", max_df=5, max_df_frac=0.1)
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="max_df_frac"):
            dedup.resolve_max_df(docs, "text", max_df_frac=bad)

    mh_abs = sorted(map(tuple, dedup.minhash_dedup_pairs(
        with_null, "text", "doc_id", shingle_k=7, max_df=11
    ).collect()))
    mh_frac = sorted(map(tuple, dedup.minhash_dedup_pairs(
        with_null, "text", "doc_id", shingle_k=7, max_df_frac=0.27
    ).collect()))
    assert mh_abs == mh_frac
    sh_abs = sorted(map(tuple, dedup.simhash_near_dup_pairs(
        with_null, "text", "doc_id", shingle_k=7, max_hamming=6, max_df=11
    ).collect()))
    sh_frac = sorted(map(tuple, dedup.simhash_near_dup_pairs(
        with_null, "text", "doc_id", shingle_k=7, max_hamming=6,
        max_df_frac=0.27,
    ).collect()))
    assert sh_abs == sh_frac
    sl_abs = sorted(map(tuple, dedup.shingle_stop_list(
        with_null, "text", "doc_id", shingle_k=7, max_df=11
    ).collect()))
    sl_frac = sorted(map(tuple, dedup.shingle_stop_list(
        with_null, "text", "doc_id", shingle_k=7, max_df_frac=0.27
    ).collect()))
    assert sl_abs == sl_frac and len(sl_abs) > 0
    # both knobs raise here too (same contract as the entry points —
    # silently preferring one would return a different stop list than
    # the caller asked for), and no-knobs keeps the historical cap 100
    with pytest.raises(ValueError, match="not both"):
        dedup.shingle_stop_list(
            docs, "text", "doc_id", shingle_k=7, max_df=50,
            max_df_frac=0.1,
        )
    default_cap = dedup.shingle_stop_list(docs, "text", "doc_id",
                                          shingle_k=7)
    explicit_100 = dedup.shingle_stop_list(docs, "text", "doc_id",
                                           shingle_k=7, max_df=100)
    assert sorted(map(tuple, default_cap.collect())) == sorted(
        map(tuple, explicit_100.collect())
    )
    # ngram face: frac form equals the resolved absolute cap, both
    # knobs raise (incl. an explicit max_df=None, which means 'exact'
    # there and so still conflicts with a fraction)
    ng_abs = sorted(map(tuple, dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", threshold=0.1, shingle_k=7, max_df=12
    ).collect()))
    ng_frac = sorted(map(tuple, dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", threshold=0.1, shingle_k=7,
        max_df_frac=0.3,  # ceil(0.3 * 40) = 12
    ).collect()))
    assert ng_abs == ng_frac
    with pytest.raises(ValueError, match="not both"):
        dedup.ngram_jaccard_pairs(
            docs, "text", "doc_id", max_df=None, max_df_frac=0.3
        )


# ---------------------------------------------------------------- #
# ADVICE #3 — caller-supplied stop list (no corpus-scale cache)    #
# ---------------------------------------------------------------- #

def test_precomputed_stops_equivalence_and_exclusivity(spark):
    """stops= (a shingle_stop_list output, e.g. persisted/checkpointed
    by the caller) must reproduce the in-line max_df path exactly, and
    combining it with max_df/max_df_frac is an error."""
    docs = _boiler_corpus(spark)
    stops = dedup.shingle_stop_list(
        docs, "text", "doc_id", shingle_k=7, max_df=5
    )
    inline = sorted(map(tuple, dedup.minhash_dedup_pairs(
        docs, "text", "doc_id", shingle_k=7, max_df=5
    ).collect()))
    supplied = sorted(map(tuple, dedup.minhash_dedup_pairs(
        docs, "text", "doc_id", shingle_k=7, stops=stops
    ).collect()))
    assert inline == supplied
    sh_inline = sorted(map(tuple, dedup.simhash_near_dup_pairs(
        docs, "text", "doc_id", shingle_k=7, max_hamming=6, max_df=5
    ).collect()))
    sh_supplied = sorted(map(tuple, dedup.simhash_near_dup_pairs(
        docs, "text", "doc_id", shingle_k=7, max_hamming=6, stops=stops
    ).collect()))
    assert sh_inline == sh_supplied
    for fn in (dedup.minhash_dedup_pairs, dedup.simhash_near_dup_pairs):
        with pytest.raises(ValueError, match="not both"):
            fn(docs, "text", "doc_id", shingle_k=7, stops=stops, max_df=5)


def test_pipeline_threads_frac_and_guard(spark):
    """The release funnel forwards the new knobs: a frac-mitigated run
    equals the absolute-max_df run, and guard='raise' on an
    unmitigated boilerplate corpus fails fast from inside the funnel."""
    from databricks_flight_etl_spark.pipeline import run_textprep_pipeline

    docs = _boiler_corpus(spark, n=30)
    kw = dict(
        min_tokens=1, max_stopword_ratio=1.0,
        langs=("en", "es", "de", "fr", "??"), near_dup_threshold=0.8,
        chunk_tokens=16, overlap=4,
    )
    a = run_textprep_pipeline(docs, near_dup_max_df=9, **kw)
    spark.catalog.clearCache()
    b = run_textprep_pipeline(docs, near_dup_max_df_frac=0.3, **kw)  # 9/30
    assert sorted(r.doc_id for r in a.kept.collect()) == sorted(
        r.doc_id for r in b.kept.collect()
    )
    spark.catalog.clearCache()
    with pytest.raises(ValueError, match="bg_jaccard_est"):
        run_textprep_pipeline(docs, near_dup_guard="raise", **kw)
    spark.catalog.clearCache()


# ---------------------------------------------------------------- #
# VERDICT stretch #8 — bounded output='clusters'                   #
# ---------------------------------------------------------------- #

def test_output_clusters_equals_cc_of_full_pairs(spark):
    """output='clusters' must label exactly like feeding the full
    verified pair list through connected_components — same components,
    min-id labels — while never materializing the pair list for the
    caller (the O(n)-output path for corpora whose true pair count is
    quadratic)."""
    from databricks_flight_etl_spark.operators.graph import (
        connected_components,
    )

    base = _diverse_corpus(spark, n=60)
    clones = base.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    docs = base.unionByName(clones)
    pairs = dedup.minhash_dedup_pairs(
        docs, "text", "doc_id", threshold=0.5, shingle_k=5, guard="off"
    )
    expected = sorted(
        map(tuple, connected_components(
            pairs.select("id_a", "id_b")
        ).collect())
    )
    spark.catalog.clearCache()
    got = sorted(map(tuple, dedup.minhash_dedup_pairs(
        docs, "text", "doc_id", threshold=0.5, shingle_k=5, guard="off",
        output="clusters",
    ).collect()))
    assert got == expected and len(got) > 0
    with pytest.raises(ValueError, match="output"):
        dedup.minhash_dedup_pairs(
            docs, "text", "doc_id", output="edges"
        )
    # simhash face of the same option
    spark.catalog.clearCache()
    sh_pairs = dedup.simhash_near_dup_pairs(
        docs, "text", "doc_id", max_hamming=6, guard="off"
    )
    sh_expected = sorted(
        map(tuple, connected_components(
            sh_pairs.select("id_a", "id_b")
        ).collect())
    )
    spark.catalog.clearCache()
    sh_got = sorted(map(tuple, dedup.simhash_near_dup_pairs(
        docs, "text", "doc_id", max_hamming=6, guard="off",
        output="clusters",
    ).collect()))
    assert sh_got == sh_expected
    with pytest.raises(ValueError, match="output"):
        dedup.simhash_near_dup_pairs(
            docs, "text", "doc_id", output="edges"
        )


# ---------------------------------------------------------------- #
# ADVICE #4 — shingle_df_profile is ANSI-mode-stable               #
# ---------------------------------------------------------------- #

def test_profile_ansi_stable_on_degenerate_corpora(spark):
    """0- and 1-doc corpora yield the SAME row (ratio columns NULL)
    whether spark.sql.ansi.enabled is true or false — an unguarded
    division would raise DIVIDE_BY_ZERO under ANSI."""
    docs = _diverse_corpus(spark, n=3)
    one, empty = docs.limit(1), docs.where(F.lit(False))
    rows = {}
    for ansi in ("false", "true"):
        spark.conf.set("spark.sql.ansi.enabled", ansi)
        try:
            rows[ansi] = [
                dedup.shingle_df_profile(
                    d, "text", "doc_id", shingle_k=5
                ).collect()[0].asDict()
                for d in (empty, one)
            ]
        finally:
            spark.conf.set("spark.sql.ansi.enabled", "false")
    assert rows["false"] == rows["true"]
    empty_row, one_row = rows["false"]
    assert empty_row["bg_jaccard_est"] is None
    assert empty_row["top_share"] is None
    assert one_row["bg_jaccard_est"] is None  # no pair to predict
    assert one_row["top_share"] == 1.0


# ---------------------------------------------------------------- #
# ADVICE #2 — observer read: commit landing during the LAST read   #
# ---------------------------------------------------------------- #

def test_read_state_final_recheck_spares_healthy_layout(
    spark, tmp_path, monkeypatch
):
    """A commit that completes during the observer's 3rd (last) read
    attempt — after that iteration's pre-check — leaves a healthy
    layout; the for-else must re-check once more and fall through to
    the live read instead of raising 'crash layout persistent'."""
    from databricks_flight_etl_spark.streaming import jobs

    st = str(tmp_path / "state")
    os.makedirs(st + ".__old")
    with open(os.path.join(st + ".__old", "bad.parquet"), "wb") as f:
        f.write(b"not parquet")  # every snapshot read fails

    calls = {"n": 0}

    def healing_sleep(_secs):
        calls["n"] += 1
        if calls["n"] == 3:  # the commit finishes during attempt 3
            import shutil

            import pyarrow as pa
            import pyarrow.parquet as pq

            # pyarrow, not spark.write: a Spark action here would call
            # the (unpatched) real sleep internally but, more to the
            # point, the healing must emulate an EXTERNAL committer
            os.makedirs(st)
            pq.write_table(
                pa.table({"id": list(range(5))}),
                os.path.join(st, "part-0.parquet"),
            )
            shutil.rmtree(st + ".__old")

    monkeypatch.setattr(jobs, "_retry_sleep", healing_sleep)
    out = jobs._read_state(spark, st, rollback=False)
    assert out is not None and out.count() == 5
    assert calls["n"] == 3  # healed only on the final attempt
    # and with NO healing the persistent crash layout still raises
    st2 = str(tmp_path / "state2")
    os.makedirs(st2 + ".__old")
    with open(os.path.join(st2 + ".__old", "bad.parquet"), "wb") as f:
        f.write(b"not parquet")
    monkeypatch.setattr(jobs, "_retry_sleep", lambda s: None)
    with pytest.raises(IOError, match="crash layout persistent"):
        jobs._read_state(spark, st2, rollback=False)


# ---------------------------------------------------------------- #
# VERDICT stretch #7 — bg_jaccard_est predictive-quality property  #
# ---------------------------------------------------------------- #

def _py_shingles(text: str, k: int) -> set:
    """Python mirror of normalize_text + _shingles_of: lowercase, trim,
    collapse whitespace runs; distinct k-grams, whole text when
    shorter than k."""
    import re

    t = re.sub(r"\s+", " ", text.lower().strip())
    if len(t) >= k:
        return {t[i:i + k] for i in range(len(t) - k + 1)}
    return {t}


def _mean_pairwise_identity_check(spark, texts, k):
    sets = [_py_shingles(t, k) for t in texts if t is not None]
    n = len(sets)
    inter = union = 0
    js = []
    for i in range(n):
        for j in range(i + 1, n):
            ii = len(sets[i] & sets[j])
            uu = len(sets[i] | sets[j])
            inter += ii
            union += uu
            js.append(ii / uu)
    expected = inter / union  # micro-averaged pairwise Jaccard
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = dedup.shingle_df_profile(
        df, "text", "doc_id", shingle_k=k, decimals=9
    ).collect()[0]["bg_jaccard_est"]
    # bg_jaccard_est = Σ∩ / Σ∪ over ordered pairs EXACTLY:
    # E[∩]/(2E[size]−E[∩]) with exact decimal sums algebraically
    # reduces to the pair-sum ratio — so the tolerance is only the
    # final double division + round(…, 9)
    assert got == pytest.approx(expected, abs=5e-9), (texts, js)
    # and therefore sits inside the pairwise envelope (mediant bound)
    assert min(js) - 1e-9 <= got <= max(js) + 1e-9


def test_bg_jaccard_est_is_microaveraged_pairwise_jaccard(spark):
    """The estimator the pre-flight guard hangs operational decisions
    on is EXACTLY the union-weighted mean of all pairwise Jaccards
    (Σ|A∩B| / Σ|A∪B| over pairs): certified here against brute-force
    python set arithmetic across entropy regimes, including the
    all-identical corpus (J=1), disjoint corpus (J=0), and mixed
    short/long texts that exercise the whole-text-shingle fallback."""
    cases = [
        ["aaaa bbbb cccc", "aaaa bbbb dddd", "eeee ffff gggg"],
        ["same text here"] * 4,                       # J_bg = 1
        ["abcdefgh", "ijklmnop", "qrstuvwx"],         # disjoint → 0
        ["ab", "ab", "cd", "abcdef"],                 # short-text fallback
        ["x y z " * 10, "x y z " * 10 + "tail", "unrelated words"],
        ["  Spaces   and  CASE  ", "spaces and case", "zzz"],
    ]
    for texts in cases:
        _mean_pairwise_identity_check(spark, texts, k=3)


def test_bg_jaccard_est_property_random_corpora(spark):
    """Hypothesis sweep: random small corpora from a 3-char alphabet
    (high shingle collision rate — the adversarial regime), n ≤ 8,
    pinning the identity at k=3 and k=5."""
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings
    from hypothesis import strategies as st

    texts_strategy = st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=14),
        min_size=2, max_size=8,
    )

    @settings(max_examples=12, deadline=None)
    @given(texts=texts_strategy, k=st.sampled_from([3, 5]))
    def run(texts, k):
        _mean_pairwise_identity_check(spark, texts, k)

    run()
