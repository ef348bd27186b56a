"""Round-10 checks: guard telemetry (last_guard_profile — the round-9
VERDICT stretch: the guard's eager measurement must be readable, not
print-only), the stops= precomputed path's equivalence to the inline
max_df path (backing the new certified q_minhash_stops_supplied), and
the bench rep-count knob honoring explicit values (round-9 ADVICE)."""

import warnings

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
# r9 VERDICT stretch #6 — guard telemetry accessor                  #
# ---------------------------------------------------------------- #

def test_last_guard_profile_matches_shingle_df_profile(spark):
    """The accessor's measurement must be the SAME quantity
    shingle_df_profile reports: bg_jaccard_est / n_docs /
    total_occurrences agree with the diagnostic's row on the same
    corpus at the same shingle_k (the guard computes the sums-only
    core of that profile)."""
    docs = _boiler_corpus(spark)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        dedup.minhash_dedup_pairs(
            docs, "text", "doc_id", shingle_k=7, guard="warn"
        )
    got = dedup.last_guard_profile()
    assert got is not None
    ref = dedup.shingle_df_profile(
        docs, "text", "doc_id", shingle_k=7, decimals=9
    ).collect()[0]
    assert got["n_docs"] == ref["n_docs"]
    assert got["total_occurrences"] == ref["total_occurrences"]
    assert got["bg_jaccard_est"] == pytest.approx(
        float(ref["bg_jaccard_est"]), abs=1e-9
    )
    assert got["triggered"] is True
    assert got["caller"]  # names the entry point for log lines


def test_last_guard_profile_on_quiet_corpus_and_raise_path(spark):
    """triggered=False on a high-entropy corpus; and on the raise
    path the measurement must be retained even though the call
    errors — that is the whole point of the accessor (the eager jobs
    already ran)."""
    dedup.minhash_dedup_pairs(
        _diverse_corpus(spark), "text", "doc_id", shingle_k=7,
        guard="warn",
    )
    quiet = dedup.last_guard_profile()
    assert quiet is not None and quiet["triggered"] is False
    assert quiet["bg_jaccard_est"] is not None
    assert quiet["bg_jaccard_est"] <= quiet["threshold"]

    with pytest.raises(ValueError):
        dedup.simhash_near_dup_pairs(
            _boiler_corpus(spark), "text", "doc_id", guard="raise"
        )
    loud = dedup.last_guard_profile()
    assert loud["triggered"] is True
    assert loud["bg_jaccard_est"] > loud["threshold"]


def test_last_guard_profile_returns_a_copy(spark):
    """Mutating the returned dict must not corrupt the retained
    telemetry (accessor hands out copies)."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        dedup.minhash_dedup_pairs(
            _boiler_corpus(spark), "text", "doc_id", shingle_k=7,
            guard="warn",
        )
    a = dedup.last_guard_profile()
    a["bg_jaccard_est"] = -1.0
    b = dedup.last_guard_profile()
    assert b["bg_jaccard_est"] != -1.0


# ---------------------------------------------------------------- #
# r9 VERDICT task #3 — stops= precomputed path ≡ inline max_df      #
# ---------------------------------------------------------------- #

def _cloned_boiler_corpus(spark, n=30):
    """Boilerplate-prefixed diverse docs plus a near-identical clone
    of every 5th doc: the stop list is non-empty (the shared prefix's
    shingles have df=n+clones > 10) and true near-dup pairs exist
    (doc, clone) — so the equivalence check is non-vacuous on BOTH
    the exclusion and the surviving pairs."""
    base = _diverse_corpus(spark, n).select(
        "doc_id",
        F.concat(
            F.lit("breaking news subscribe to our newsletter today "),
            F.col("text"),
        ).alias("text"),
    )
    clones = base.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    return base.unionByName(clones)


def test_stops_supplied_equals_inline_max_df(spark):
    """Precomputing shingle_stop_list(max_df=K) and passing it via
    stops= must produce bit-identical pairs to the inline max_df=K
    path — the contract the certified q_minhash_stops_supplied rests
    on (its oracle is q_minhash_stopshingle's SQL verbatim)."""
    docs = _cloned_boiler_corpus(spark)
    inline = dedup.minhash_dedup_pairs(
        docs, "text", "doc_id", threshold=0.8, shingle_k=7,
        hash_family="md5", max_df=10,
    ).orderBy("id_a", "id_b").collect()
    stops = dedup.shingle_stop_list(
        docs, "text", "doc_id", shingle_k=7, max_df=10
    )
    supplied = dedup.minhash_dedup_pairs(
        docs, "text", "doc_id", threshold=0.8, shingle_k=7,
        hash_family="md5", stops=stops,
    ).orderBy("id_a", "id_b").collect()
    assert len(inline) > 0  # clone pairs survive the exclusion
    assert [r.asDict() for r in inline] == [
        r.asDict() for r in supplied
    ]


# ---------------------------------------------------------------- #
# round-10 finding — catalog guard must not probe location-less     #
# relations (session-aging root cause)                              #
# ---------------------------------------------------------------- #

def test_location_in_use_skips_temp_views(spark, tmp_path, monkeypatch):
    """_location_in_use (write_bucketed's orphan-cleanup guard) must
    DESCRIBE only MANAGED/EXTERNAL tables: views and temp views can
    never resolve to a storage location, and probing them made the
    guard degrade with session age (2.6s fresh → 13.2s after 257
    harness queries on the round-10 bench — one failing DESCRIBE +
    py4j exception per accumulated temp view, per call)."""
    from databricks_flight_etl_spark import sources

    spark.range(3).createOrReplaceTempView("tv_guard_probe")
    try:
        described = []
        orig_sql = spark.sql

        def counting_sql(q, *a, **k):
            if q.lstrip().upper().startswith("DESCRIBE"):
                described.append(q)
            return orig_sql(q, *a, **k)

        monkeypatch.setattr(spark, "sql", counting_sql)
        assert sources._location_in_use(
            spark, str(tmp_path / "nowhere")
        ) is False
        assert not any("tv_guard_probe" in q for q in described)
    finally:
        spark.catalog.dropTempView("tv_guard_probe")


# ---------------------------------------------------------------- #
# r9 ADVICE — bench rep-count knob honors explicit values           #
# ---------------------------------------------------------------- #

def test_env_reps_honors_and_clamps(monkeypatch, capsys):
    import bench

    monkeypatch.delenv("X_REPS", raising=False)
    assert bench._env_reps("X_REPS", 3) == 3  # unset -> default

    monkeypatch.setenv("X_REPS", "1")
    assert bench._env_reps("X_REPS", 3) == 1  # honored, not max(3,·)
    monkeypatch.setenv("X_REPS", "7")
    assert bench._env_reps("X_REPS", 3) == 7

    monkeypatch.setenv("X_REPS", "0")
    assert bench._env_reps("X_REPS", 3) == 1  # clamped WITH a note
    assert "X_REPS" in capsys.readouterr().err

    monkeypatch.setenv("X_REPS", "lots")
    assert bench._env_reps("X_REPS", 3) == 3  # unparsable -> default
    assert "X_REPS" in capsys.readouterr().err
