"""End-to-end curation pipeline (SURVEY §7 stages 0-8).

One heavy distributed pass per run:

  pages ──filter(lookback)──▶ salted repartition on url-hash
        ──score (one pandas-UDF pass)──▶ rule flags + verdict + scrub
        ──▶ curated parquet, partitioned by url-hash bucket
             (dynamic partition overwrite ⇒ idempotent per bucket)

then cheap column-pruned scans over the curated table produce the
per-partition conformance reports, the normalized metrics table and
the threshold exceptions — mirroring the reference's split between
the query run (data_curation_tables.sas) and the downstream
normalization + EDC report (normalization.sas / edc_report.sas).

Scale design (100 TB / 10^12 docs):
* the fact table is touched exactly once per run; everything else
  reads the much smaller curated columns (column pruning + bucket
  partition pruning do the work);
* repartition key = (bucket, salt): url-hash buckets give resume
  granularity, the salt splits hot long-tail domains inside a bucket;
  AQE skew-join/coalesce is on in the session;
* reports aggregate before joining domain frames — shuffles carry
  only (category, counts) rows;
* resume filters pending buckets at the SCAN (bucket predicate), so
  a resumed run reads only unfinished data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pcornet_data_curation_spark.config import PipelineConfig
from pcornet_data_curation_spark.operators import rules as R
from pcornet_data_curation_spark.operators.checks import (
    DEFAULT_CHECKS,
    expected_reports_check,
    run_checks,
)
from pcornet_data_curation_spark.operators.normalize import (
    assemble_metrics,
    extraction_consistent_col,
    melt_report,
)
from pcornet_data_curation_spark.operators.reports import (
    cont_stats,
    dash_window_counts,
    dash_windows,
    minmax_profile,
    n_pct,
    n_pct_noref,
    tag_profile,
    ym_dense_fill,
)
from pcornet_data_curation_spark.operators.score import STAT_COLS, with_doc_stats
from pcornet_data_curation_spark.operators.verdict import with_verdict
from pcornet_data_curation_spark.plans.checkpoint import Manifest
from pcornet_data_curation_spark.plans.lineage import LineageTracker

# curated-table columns kept for reporting (narrow on purpose: reports
# never need the raw html/text again)
CURATED_STATS = [
    "n_chars",
    "n_tokens",
    "n_sentences",
    "lang_pred",
    "lang_conf",
    "ppl",
]

LANG_VALUESET = ["en", "de", "fr", "es", "it", "pt", "nl"]

# expected-output registry (the reference's dc_tables expected-dataset
# list, data_curation_base.sas:3093-3105): every run must produce
# exactly these reports; completeness_check flags any gap
EXPECTED_REPORTS = [
    "rule_summary",
    "pages_tag",
    "lang_dist",
    "warc_ym_dist",
    "tokens_by_keep",
    "ppl_stats",
    "warc_minmax",
    "verdict_summary",
    "url_unique",
    "scrub_summary",
    "run_metadata",
    "extraction_summary",
    "dash_activity",
    "referential_summary",
    "domain_dist",
    "domain_summary",
    "dedup_summary",
]


def bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets)).cast("int")


def salt_col(salt_factor: int):
    # independent second hash stream (seeded by an extra literal)
    return F.pmod(F.xxhash64(F.col("url"), F.lit(0x5A17)), F.lit(salt_factor)).cast("int")


def salted_repartition(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Append (bucket, salt) url-hash columns and range-partition one
    cell per partition. repartitionByRange, NOT hash repartition: with
    exactly n_buckets*salt_factor distinct cells, hash-mod collides
    cells into the same partition (balls-into-bins → ~37% empty
    partitions and 3-4-cell stragglers; measured max/mean ≈ 4). Range
    partitioning assigns contiguous cells one-per-partition — balanced,
    and each task writes into a single bucket directory."""
    out = df.withColumn("bucket", bucket_col(cfg.n_buckets)).withColumn(
        "salt", salt_col(cfg.salt_factor)
    )
    return out.repartitionByRange(cfg.n_buckets * cfg.salt_factor, "bucket", "salt")


def lookback_filter(pages: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Keep rows with warc_ts >= run_date - lookback (or NULL), the
    reference's lookback scan filter (data_curation_base.sas:44-47,
    applied per table e.g. data_curation_tables.sas:1334-1335).
    Pushed to the parquet scan by Catalyst."""
    cut = cfg.lookback_cutoff.isoformat()
    return pages.where(
        F.col("warc_ts").isNull() | (F.col("warc_ts") >= F.lit(cut).cast("timestamp"))
    )


def with_exact_dup_flag(df: DataFrame) -> DataFrame:
    """Append exact_dup: content-duplicate marker (C4/Gopher exact
    dedup, and the content analog of the reference's non-unique key
    detection). Fingerprint = xxhash64 of the whitespace/case
    normalized text; the survivor of each fingerprint group is the
    MINIMUM url (deterministic — independent of partitioning, resume
    order, and cluster size), every other copy is flagged.

    Scale shape: groupBy(fp).agg(min(url)) — partial aggregation
    absorbs a hot fingerprint (10^6 copies of a boilerplate page
    reduce map-side to one row per input partition) — then one
    fp-keyed equi-join back. The probe side of that join carries the
    full rows through one extra content-keyed shuffle; that is the
    irreducible cost of GLOBAL exact dedup (any scheme must co-locate
    identical content once), and a skewed fp on the probe side is
    split by AQE skew-join handling."""
    ws = "[ \\t\\n\\r\\f\\x0B]+"
    fp = F.xxhash64(F.lower(F.trim(F.regexp_replace(F.coalesce(F.col("text"), F.lit("")), ws, " "))))
    keyed = df.withColumn("_fp", fp)
    survivors = keyed.groupBy("_fp").agg(F.min("url").alias("_surv_url"))
    # null-safe: a NULL-url copy of survivable content IS a duplicate
    # (min(url) skipped it), and a group of only NULL urls has no
    # orderable survivor so none of its rows are flagged — either way
    # exact_dup must come out two-valued, never NULL (a plain != would
    # propagate NULL through `keep` in drop mode and make keep
    # three-valued: counted by no aggregate, dropped by every filter).
    # Rows missing the contract key (url, per BASELINE input_hint) are
    # deliberately NOT deduped among themselves — there is no
    # deterministic survivor without an id — and are surfaced loudly by
    # red check 10.03 (null urls in curated table) instead.
    return (
        keyed.join(survivors, "_fp")
        .withColumn("exact_dup", ~F.col("url").eqNullSafe(F.col("_surv_url")))
        .drop("_fp", "_surv_url")
    )


def with_near_dup_flag(df: DataFrame, threshold: float = 0.8) -> DataFrame:
    """Append exact_dup via NEAR-duplicate grouping: MinHash-LSH
    candidate pairs at `threshold` estimated jaccard → connected
    components → every non-minimum url of a component is flagged (the
    same column name as the exact method so downstream reports/checks
    are method-agnostic; dedup_summary records which method ran).

    Scale shape is the dedup family's: banded signature self-join
    shuffles (band, bandhash, url) only; component labeling is
    large-star/small-star alternation (O(log n) rounds on any graph)
    with a scalar-only driver loop. NOTE: component resolution is an
    iterative
    computation — calling this triggers Spark jobs eagerly rather than
    extending the lazy plan (documented pipeline-stage cost, not a
    per-report cost)."""
    from pcornet_data_curation_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
        unpersist_deps,
    )

    pairs = minhash_lsh_pairs(
        df.select("url", "text"), text_col="text", id_col="url", threshold=threshold
    )
    comp = connected_components(pairs, id_a="id_a", id_b="id_b")
    unpersist_deps(pairs)
    dropped = (
        comp.where(F.col("node") != F.col("component"))
        .select(F.col("node").alias("url"), F.lit(True).alias("exact_dup"))
    )
    return df.join(dropped, "url", "left").na.fill({"exact_dup": False})


def curate(
    pages: DataFrame, cfg: PipelineConfig, precomputed_dedup: bool = False
) -> DataFrame:
    """The full row-level transform chain (stages 0-5), lazily planned.

    precomputed_dedup=True: `pages` already carries an exact_dup column
    (the streaming path computes it with the stateful first-seen
    operator before curation, streaming/stateful.stream_dedup_flag) —
    skip the batch flag computation but still honor cfg.dedup's
    drop-mode keep fold."""
    df = lookback_filter(pages, cfg)
    if cfg.respect_noindex and "html" in df.columns:
        # publisher opt-out re-check (stored WARCs must re-honor what
        # the crawler honored at fetch time): three regexp_extracts
        # over html AT THE SCAN, pages dropped before any payload
        # processing — html is about to be read here anyway for the
        # extraction check, so the filter rides the same scan
        from pcornet_data_curation_spark.operators.robotsmeta import (
            robots_noindex_col,
        )

        df = df.where(~robots_noindex_col(F.col("html")))
    # consume html AT THE SCAN: extraction_ok is derived here and html
    # dropped immediately, so the wide binary column never rides the
    # (bucket, salt) shuffle or the Arrow round-trip of the scoring UDF
    # (measured: carrying it through cost ~3x on the curation pass).
    # extraction_ok evaluates against the ORIGINAL text column; the
    # missing-text fill happens in the SAME projection (identical
    # expression + ordering as the streaming path, both from
    # operators/extract.missing_text_filled_col).
    if "extraction_ok" in df.columns:
        # already derived upstream (the streaming dedup path consumes
        # html BEFORE its stateful shuffle, same rule as this scan)
        extraction_ok = F.col("extraction_ok")
    elif cfg.check_extraction:
        extraction_ok = extraction_consistent_col()
    else:
        extraction_ok = F.lit(True)
    text_expr = F.col("text")
    if cfg.extract_missing_text and "html" in df.columns:
        from pcornet_data_curation_spark.operators.extract import (
            missing_text_filled_col,
        )

        text_expr = missing_text_filled_col(
            preserve_lines=cfg.extract_preserve_lines
        )
    tail_cols = ["lang"] + (["exact_dup"] if precomputed_dedup else [])
    df = df.select(
        "url", "warc_ts", text_expr.alias("text"),
        *tail_cols, extraction_ok.alias("extraction_ok"),
    )
    # text-repair stages (opt-in, production order: fix encoding, then
    # remove boilerplate, THEN dedup/score — so fingerprints and
    # stopword densities see repaired text). Applied to the projected
    # `text` ATTRIBUTE, not the extract expression: boilerplate
    # cleaning references its input several times and CollapseProject's
    # multi-reference guard keeps the extract chain evaluated once in
    # the projection below. Pure Column algebra — the streaming path
    # (curate_stream -> curate) gets both stages for free. NULL text
    # stays NULL: missing-text rule accounting is untouched.
    if cfg.fix_mojibake:
        from pcornet_data_curation_spark.operators.mojibake import mojibake_fix_col

        df = df.withColumn("text", mojibake_fix_col(F.col("text")))
    if cfg.remove_boilerplate:
        from pcornet_data_curation_spark.operators.boilerplate import (
            with_boilerplate_removed,
        )

        df = with_boilerplate_removed(df, "text")
    if precomputed_dedup:
        pass  # flag already on the rows (streaming stateful dedup)
    elif cfg.dedup != "off":
        # global dedup BEFORE the (bucket, salt) repartition: the
        # dedup-shuffle output feeds straight into the range
        # partitioner, and the survivor choice (min url) is a pure
        # function of the full input, so a partial-bucket resume
        # recomputes identical flags. 'flag' records exact_dup only;
        # 'drop' also folds it into keep. Default 'off': the F1-parity
        # contract is per-url verdicts, and dedup is a corpus-level
        # decision the caller opts into (C4 drops, Gopher reports).
        if cfg.dedup_method == "near":
            df = with_near_dup_flag(df, cfg.near_threshold)
        else:
            df = with_exact_dup_flag(df)
    else:
        df = df.withColumn("exact_dup", F.lit(False))
    df = salted_repartition(df, cfg)
    df = with_doc_stats(df)
    df = with_verdict(df, cfg.rule_overrides)
    flag_cols = [R.flag_name(r) for r in R.active_rules(cfg.rule_overrides)]
    if cfg.dedup == "drop":
        df = df.withColumn("keep", F.col("keep") & ~F.col("exact_dup"))
    # scrub_hit recorded here because the raw text column is dropped
    # from the curated table (reports never need it again);
    # extraction_ok was derived at the scan (html never left stage 0)
    scrub_hit = ~F.col("scrubbed_text").eqNullSafe(F.col("text"))
    return df.select(
        "url",
        "warc_ts",
        "lang",
        "bucket",
        *CURATED_STATS,
        *flag_cols,
        "keep",
        scrub_hit.alias("scrub_hit"),
        "extraction_ok",
        "exact_dup",
        "scrubbed_text",
    )


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    cfg: PipelineConfig,
    tracker: LineageTracker | None = None,
    limit_buckets: list[int] | None = None,
) -> dict:
    """Run (or resume) a curation run into cfg.output_root.

    limit_buckets restricts which pending buckets are processed this
    invocation — used by tests to simulate a killed run.
    Returns a dict of output paths + run stats.
    """
    tracker = tracker or LineageTracker()
    out = cfg.output_root
    if cfg.prior_run_root and os.path.realpath(cfg.prior_run_root) == os.path.realpath(out):
        # a prior pointed at this run's own output would lazily read
        # <out>/metrics while the run overwrite-rewrites that same path
        # mid-plan — a read-under-overwrite cycle that fails or yields
        # silently empty drift rows. Natural mistake on resume; reject.
        raise ValueError(
            "prior_run_root must reference a DIFFERENT run's output root "
            f"(got the run's own output {out!r}); drift compares across "
            "runs, not a run against itself"
        )
    curated_path = os.path.join(out, "curated")
    manifest = Manifest.load_or_init(out, cfg.n_buckets)
    # staleness is evaluated against the store AS THIS RUN FOUND IT: a
    # prior run that curated buckets but died before re-reporting left
    # reports older than data, and that is only observable BEFORE this
    # run rewrites and re-marks every report (evaluating the live
    # manifest after reporting would read stale=0 unconditionally —
    # dead instrumentation)
    import copy as _copy
    import time as _time

    pre_run_manifest = _copy.deepcopy(manifest.data)
    pre_run_ts = _time.time()

    # URL-level pre-filter (opt-in): reject by url BEFORE any payload
    # is decoded — the RefinedWeb/C4 stage order. The flagged frame is
    # kept for the url_filter_summary report (one column-pruned agg
    # over urls); rejected rows never reach scoring/curation.
    url_flagged = None
    if cfg.url_blocklist:
        from pcornet_data_curation_spark.operators.urlfilter import url_filter

        bl = (
            spark.read.text(cfg.url_blocklist)
            .select(F.trim(F.col("value")).alias("domain"))
            .where(F.length("domain") > 0)
        )
        url_flagged = url_filter(pages, bl, persist_blocked=True)
        pages = url_flagged.where(F.col("url_keep")).drop(
            "host", "blocked_host", "url_keyword", "ip_host",
            "non_ascii_host", "url_too_long", "url_too_many_params", "url_keep",
        )

    # the blocked-host set persisted by url_filter must be released
    # on EVERY exit path — an exception mid-run must not leak the
    # cache for the session lifetime
    try:
        pending = manifest.pending_buckets()
        if limit_buckets is not None:
            pending = [b for b in pending if b in limit_buckets]

        if pending:
            with tracker.stage("curate", rows_in=None) as h:
                df = curate(pages, cfg)
                if len(pending) < cfg.n_buckets:
                    df = df.where(F.col("bucket").isin(pending))
                (
                    df.write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("bucket")
                    .parquet(curated_path)
                )
                # per-bucket completion stats: one tiny agg over what we wrote
                done = (
                    spark.read.parquet(curated_path)
                    .where(F.col("bucket").isin(pending))
                    .groupBy("bucket")
                    .agg(F.count(F.lit(1)).alias("rows"), F.sum(F.col("keep").cast("long")).alias("kept"))
                    .collect()
                )
                written = {int(r["bucket"]): (int(r["rows"]), int(r["kept"])) for r in done}
                h["rows_out"] = sum(r for r, _ in written.values())
                for b in pending:
                    rows, kept = written.get(b, (0, 0))
                    manifest.mark_done(b, rows, kept)
                manifest.save()

        # ---- reporting over completed buckets (cheap, column-pruned) ----
        done_buckets = manifest.done_buckets()
        cur = spark.read.parquet(curated_path).where(F.col("bucket").isin(done_buckets))
        # store-version guard: a store fully curated before the dedup stage
        # landed has no exact_dup column, and a resume/re-report over it
        # (all buckets done → curate never rewrites) would otherwise raise
        # AnalysisException at the first exact_dup reference. A MIXED store
        # (legacy buckets + buckets this code wrote) needs per-file schema
        # merging — the default read takes ONE file footer's schema, so
        # whichever vintage wins would either mask real flags to false or
        # silently null legacy rows. mergeSchema is paid only when the
        # default read looks legacy (rare, footer-bounded); legacy rows'
        # NULL flags coalesce to measured-false either way.
        legacy_no_dedup = "exact_dup" not in cur.columns
        if legacy_no_dedup:
            merged = spark.read.option("mergeSchema", "true").parquet(curated_path).where(
                F.col("bucket").isin(done_buckets)
            )
            if "exact_dup" in merged.columns:  # mixed store: real flags exist
                cur = merged.withColumn(
                    "exact_dup", F.coalesce(F.col("exact_dup"), F.lit(False))
                )
                legacy_no_dedup = False
            else:
                cur = cur.withColumn("exact_dup", F.lit(False))
        else:
            cur = cur.withColumn(
                "exact_dup", F.coalesce(F.col("exact_dup"), F.lit(False))
            )

        reports: dict[str, DataFrame] = {}
        with tracker.stage("report_rule_summary"):
            # rule-level pass/fail per bucket (reference code_summary,
            # potential_code_errors.sas:1294-1335) — single agg, flags are
            # already materialized booleans.
            flag_cols = [R.flag_name(r) for r in R.active_rules(cfg.rule_overrides)]
            aggs = [F.count(F.lit(1)).alias("records")] + [
                F.sum(F.col(c).cast("long")).alias(c) for c in flag_cols
            ]
            wide = cur.groupBy("bucket").agg(*aggs)
            stack_args = ", ".join(f"'{c[5:]}', `{c}`" for c in flag_cols)
            reports["rule_summary"] = wide.selectExpr(
                "bucket",
                "records",
                f"stack({len(flag_cols)}, {stack_args}) as (rule_id, fail_records)",
            ).withColumn(
                "fail_pct",
                F.when(F.col("records") > 0, F.round(F.col("fail_records") * 100.0 / F.col("records"), 2)).otherwise(0.0),
            )

        with tracker.stage("report_tag_profile"):
            # valid_exprs = the reference %tag's _n vs valid distinction
            # (data_curation_base.sas:600-660): validity is a per-column
            # predicate, counted in the same single aggregation pass
            reports["pages_tag"] = tag_profile(
                cur,
                ["url", "lang", "scrubbed_text"],
                dataset="curated",
                valid_exprs={
                    "url": F.col("url").rlike("^https?://[^ \\t\\n\\r\\f]+$"),
                    "lang": F.col("lang").rlike("^[a-z]{2}(-[A-Za-z]{2})?$"),
                },
            )

        with tracker.stage("report_lang_dist"):
            reports["lang_dist"] = n_pct(cur, "lang_pred", LANG_VALUESET, distinct_col="url")

        with tracker.stage("report_ym_dist"):
            # plausible-window rows only: future / pre-1900 outliers are
            # counted by minmax_profile, not stretched into the dense fill
            # (reference invalid/future split, data_curation_tables.sas:2805-2820)
            plausible = cur.where(
                (F.col("warc_ts") >= F.lit("1900-01-01").cast("timestamp"))
                & (F.col("warc_ts") <= F.lit(cfg.run_date.isoformat()).cast("timestamp"))
            )
            ym = (
                plausible.select(F.date_format("warc_ts", "yyyy_MM").alias("ym"))
                .groupBy("ym")
                .agg(F.count(F.lit(1)).alias("record_n"))
            )
            reports["warc_ym_dist"] = ym_dense_fill(ym)

        with tracker.stage("report_cont_stats"):
            reports["tokens_by_keep"] = cont_stats(cur, "n_tokens", group=["keep"])
            reports["ppl_stats"] = cont_stats(cur, "ppl")

        with tracker.stage("report_minmax"):
            reports["warc_minmax"] = minmax_profile(
                cur, "warc_ts", future_after=cfg.run_date.isoformat()
            )

        with tracker.stage("report_verdict_summary"):
            reports["verdict_summary"] = cur.agg(
                F.count(F.lit(1)).alias("records"),
                F.sum(F.col("keep").cast("long")).alias("kept"),
                F.round(F.avg(F.col("keep").cast("double")) * 100.0, 2).alias("keep_pct"),
            )

        with tracker.stage("report_url_unique"):
            reports["url_unique"] = cur.agg(
                F.count("url").alias("url_n"),
                F.countDistinct("url").alias("url_distinct_n"),
                (F.count("url") - F.countDistinct("url")).alias("dup_url_n"),
            )

        with tracker.stage("report_run_metadata"):
            # run-level metadata (reference XTBL_L3_METADATA / DATAMART_ALL,
            # data_curation_tables.sas:46-497): engine + config + freshness
            reports["run_metadata"] = spark.createDataFrame(
                [
                    ("spark_version", spark.version),
                    ("run_date", cfg.run_date.isoformat()),
                    ("lookback_years", str(cfg.lookback_years)),
                    ("lookback_cutoff", cfg.lookback_cutoff.isoformat()),
                    ("n_buckets", str(cfg.n_buckets)),
                    ("salt_factor", str(cfg.salt_factor)),
                    ("output_root", cfg.output_root),
                ],
                "meta_key string, meta_value string",
            )

        with tracker.stage("report_dash_activity"):
            # run-date-parameterized trailing windows (reference %dash:
            # 1-5 yr spans ending run_date - 3 months,
            # data_curation_base.sas:49-55, 2868-2891)
            windows = dash_windows(
                cfg.run_date, [(f"last_{y}y", {"years": y}) for y in (1, 2, 3, 4, 5)]
            )
            reports["dash_activity"] = dash_window_counts(
                cur, "warc_ts", windows, distinct_col="url"
            )

        with tracker.stage("report_referential_summary"):
            # orphan/integrity family (reference EDC orphan-record checks)
            from pcornet_data_curation_spark.operators.reports import referential_summary

            reports["referential_summary"] = referential_summary(cur, LANG_VALUESET)

        with tracker.stage("report_domain_dist"):
            # long-tail host distribution: top-20 + OTHER rollup, plus the
            # scalar concentration stats the 14.x checks anchor on
            from pcornet_data_curation_spark.operators.reports import (
                domain_dist,
                domain_summary,
            )

            reports["domain_dist"] = domain_dist(cur)
            reports["domain_summary"] = domain_summary(cur)

        with tracker.stage("report_dedup_summary"):
            # content-duplicate profile (dedup stage mode recorded so the
            # reader knows whether dup_n was measured or the stage was off)
            dup_n = F.sum(F.col("exact_dup").cast("long"))
            total_n = F.count(F.lit(1))
            dedup_mode = "n/a" if legacy_no_dedup else cfg.dedup
            reports["dedup_summary"] = cur.agg(
                F.lit(dedup_mode).alias("mode"),
                F.lit(cfg.dedup_method if dedup_mode not in ("off", "n/a") else "n/a").alias("method"),
                total_n.alias("records"),
                dup_n.alias("dup_n"),
                F.when(total_n > 0, F.floor(dup_n * 1000000.0 / total_n) / 10000.0)
                .otherwise(0.0)
                .alias("dup_pct"),
            )

        if url_flagged is not None:
            with tracker.stage("report_url_filter_summary"):
                # one extra COLUMN-PRUNED pass over urls for the opt-in
                # report (host parse is cheap relative to curation); the
                # blocked-host derivation — the only shuffling part — is
                # persisted inside url_filter and shared with the curate
                # pass, so it is not recomputed here
                dropped = F.sum((~F.col("url_keep")).cast("long"))
                total = F.count(F.lit(1))
                reports["url_filter_summary"] = url_flagged.agg(
                    total.alias("records"),
                    dropped.alias("dropped_n"),
                    F.when(total > 0, F.floor(dropped * 10000.0 / total) / 100.0)
                    .otherwise(F.lit(0.0))
                    .alias("dropped_pct"),
                )

        with tracker.stage("report_scrub_summary"):
            hits = F.sum(F.col("scrub_hit").cast("long"))
            total = F.count(F.lit(1))
            reports["scrub_summary"] = cur.agg(
                total.alias("records"),
                hits.alias("scrub_hits"),
                F.when(total > 0, F.floor(hits * 10000.0 / total) / 100.0)
                .otherwise(F.lit(0.0))
                .alias("scrub_pct"),
            )

        with tracker.stage("report_extraction_summary"):
            bad = F.sum((~F.col("extraction_ok")).cast("long"))
            total = F.count(F.lit(1))
            reports["extraction_summary"] = cur.agg(
                total.alias("records"),
                bad.alias("mismatch_n"),
                F.when(total > 0, F.floor(bad * 10000.0 / total) / 100.0)
                .otherwise(F.lit(0.0))
                .alias("mismatch_pct"),
            )

        reports_path = os.path.join(out, "reports")
        csv_path = os.path.join(out, "csv")
        for name, rdf in reports.items():
            rdf.write.mode("overwrite").parquet(os.path.join(reports_path, name))
            if cfg.export_csv:
                # reference &_csv=YES gate (data_curation_print.sas:121-150);
                # reports are small aggregates, so a single CSV file each
                from pcornet_data_curation_spark.sources.tables import export_csv

                export_csv(
                    spark.read.parquet(os.path.join(reports_path, name)),
                    os.path.join(csv_path, name),
                )
            manifest.mark_report(name)
        manifest.save()

        # ---- normalize + checks (reads back the tiny report tables) ----
        with tracker.stage("normalize_metrics"):
            rread = {
                name: spark.read.parquet(os.path.join(reports_path, name)) for name in reports
            }
            melted = [
                melt_report(rread["rule_summary"], "rule_summary", ["bucket", "rule_id"]),
                melt_report(rread["pages_tag"], "pages_tag", ["dataset", "tag"]),
                melt_report(rread["lang_dist"], "lang_dist", ["category"]),
                melt_report(rread["warc_ym_dist"], "warc_ym_dist", ["ym"]),
                melt_report(rread["tokens_by_keep"], "tokens_by_keep", ["keep"]),
                melt_report(rread["ppl_stats"], "ppl_stats", []),
                melt_report(rread["warc_minmax"], "warc_minmax", ["variable"]),
                melt_report(rread["verdict_summary"], "verdict_summary", []),
                melt_report(rread["url_unique"], "url_unique", []),
                melt_report(rread["scrub_summary"], "scrub_summary", []),
                melt_report(rread["run_metadata"], "run_metadata", ["meta_key"]),
                melt_report(rread["extraction_summary"], "extraction_summary", []),
                melt_report(rread["dash_activity"], "dash_activity", ["window"]),
                melt_report(rread["referential_summary"], "referential_summary", []),
                melt_report(rread["domain_dist"], "domain_dist", ["host"]),
                melt_report(rread["domain_summary"], "domain_summary", []),
                melt_report(rread["dedup_summary"], "dedup_summary", ["mode"]),
            ]
            if "url_filter_summary" in rread:
                melted.append(
                    melt_report(rread["url_filter_summary"], "url_filter_summary", [])
                )
            # rename 'tag' melts: variable column comes from id concat; fine as category
            metrics = assemble_metrics(melted)

            # cross-run metric families (drift / staleness / trend): metric
            # ROWS appended to the same normalized table so the data-driven
            # check registry evaluates them like any other statistic. All
            # inputs are tiny aggregated tables — cost independent of corpus
            # size. Drift compares FIRST-ORDER metrics only (a prior run's
            # own drift/trend/staleness rows are excluded on both sides).
            from pcornet_data_curation_spark.operators.drift import (
                drift_metrics,
                staleness_metrics,
                trend_metrics,
            )

            _DERIVED = ("drift|", "threshold_trend", "report_staleness")

            def _first_order(m):
                cond = ~F.col("dc_name").startswith("drift|")
                for d in _DERIVED[1:]:
                    cond = cond & (F.col("dc_name") != d)
                return m.where(cond)

            # staleness has TWO distinct questions with different frames of
            # reference: `stale` (reports older than curated data — the
            # died-mid-report inconsistency) is only observable on the
            # PRE-RUN snapshot, because this run repairs it; `age_sec`
            # (report older than N days, check 12.02) is about the store
            # being LEFT BEHIND — a question an in-run evaluation can never
            # answer in the positive (this run just re-marked every report,
            # so age_sec ≈ 0 here by construction, and a store nobody runs
            # never writes a metrics row). The rows below keep the metric's
            # shape in the table; the MEANINGFUL evaluation is the
            # standalone `python -m pcornet_data_curation_spark check`
            # command, which recomputes staleness from the live manifest at
            # invocation time over an existing store.
            stale_rows = staleness_metrics(pre_run_manifest, pre_run_ts, spark).where(
                F.col("statistic") == "stale"
            )
            age_rows = staleness_metrics(manifest.data, _time.time(), spark).where(
                F.col("statistic") == "age_sec"
            )
            extra = [stale_rows, age_rows]
            if cfg.prior_run_root:
                prior_path = os.path.join(cfg.prior_run_root, "metrics")
                try:
                    prior = _first_order(spark.read.parquet(prior_path))
                except Exception:
                    prior = None  # first refresh: drift/trend report n/a
                if prior is not None:
                    now_fo = _first_order(metrics)
                    extra.append(drift_metrics(now_fo, prior))
                    extra.append(trend_metrics(DEFAULT_CHECKS, now_fo, prior))
            metrics = assemble_metrics([metrics, *extra])
            metrics_path = os.path.join(out, "metrics")
            metrics.write.mode("overwrite").parquet(metrics_path)

        with tracker.stage("data_checks"):
            exceptions = run_checks(spark.read.parquet(metrics_path), DEFAULT_CHECKS)
            exceptions_path = os.path.join(out, "exceptions")
            exceptions.write.mode("overwrite").parquet(exceptions_path)

        with tracker.stage("completeness_check"):
            # expected-vs-produced registry (reference edc_prep.sas:80-125)
            completeness = expected_reports_check(
                produced=list(reports), expected=EXPECTED_REPORTS, spark=spark
            )
            completeness_path = os.path.join(out, "completeness")
            completeness.write.mode("overwrite").parquet(completeness_path)

        lineage_path = os.path.join(out, "lineage")
        tracker.to_df(spark).write.mode("append").parquet(lineage_path)

        from pcornet_data_curation_spark.operators.report_render import render_run_report

        report_md = render_run_report(spark, out)
    finally:
        if url_flagged is not None:
            from pcornet_data_curation_spark.operators.dedup import unpersist_deps

            unpersist_deps(url_flagged)

    stats = {
        "buckets_done": len(done_buckets),
        "buckets_processed_now": len(pending),
        "rows": sum(v["rows"] for v in manifest.data["buckets"].values()),
        "kept": sum(v["kept"] for v in manifest.data["buckets"].values()),
    }
    return {
        "curated": curated_path,
        "reports": reports_path,
        "metrics": metrics_path,
        "exceptions": exceptions_path,
        "completeness": completeness_path,
        "lineage": lineage_path,
        "report_md": report_md,
        "manifest": manifest.path,
        "stats": stats,
    }
