"""Structured Streaming lift of the curation transforms: a drained
stream must equal the batch pipeline's row-level output."""

import os

from pcornet_data_curation_spark.config import PipelineConfig
from pcornet_data_curation_spark.datagen.pages import pages_df
from pcornet_data_curation_spark.plans.pipeline import curate
from pcornet_data_curation_spark.streaming import run_stream_once


def test_stream_matches_batch(spark, tmp_path):
    indir = str(tmp_path / "pages_in")
    pages = pages_df(spark, 300, partitions=3)
    pages.write.parquet(indir)

    cfg = PipelineConfig(output_root=str(tmp_path / "out"), n_buckets=4)
    sink = run_stream_once(spark, indir, cfg)

    got = (
        spark.read.parquet(sink)
        .select("url", "keep", "scrubbed_text")
        .orderBy("url")
        .toPandas()
        .reset_index(drop=True)
    )
    want = (
        curate(spark.read.parquet(indir), cfg)
        .select("url", "keep", "scrubbed_text")
        .orderBy("url")
        .toPandas()
        .reset_index(drop=True)
    )
    assert got.equals(want)
    # checkpoint exists → exactly-once restart metadata present
    assert os.path.isdir(os.path.join(cfg.output_root, "stream_checkpoint"))


def test_windowed_lang_counts_watermark(spark, tmp_path):
    from pcornet_data_curation_spark.datagen.pages import PAGES_DDL
    from pcornet_data_curation_spark.streaming.stateful import windowed_lang_counts

    indir = str(tmp_path / "win_in")
    pages_df(spark, 400, partitions=2).write.parquet(indir)
    stream = spark.readStream.schema(PAGES_DDL).parquet(indir)
    out = str(tmp_path / "win_out")
    q = (
        windowed_lang_counts(stream, window="30 days", watermark="1 day")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "win_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out).toPandas()
    # with availableNow + watermark, only windows older than the final
    # watermark are closed/emitted; at least the early months must exist
    assert len(got) > 0
    assert set(got.columns) == {"window_start", "window_end", "lang", "record_n"}
    assert (got["record_n"] > 0).all()


def test_stream_dedup_first_seen(spark, tmp_path):
    import pandas as pd
    from pcornet_data_curation_spark.datagen.pages import PAGES_DDL, pages_pdf
    from pcornet_data_curation_spark.streaming.stateful import stream_dedup_first_seen

    indir = tmp_path / "dedup_in"
    indir.mkdir()
    base = pages_pdf(200)
    # batch 1 = originals; batch 2 = half duplicates (same text, new url)
    b1 = base.copy()
    b2 = base.head(100).copy()
    b2["url"] = b2["url"] + "?copy=1"
    spark.createDataFrame(b1, PAGES_DDL).coalesce(1).write.parquet(str(indir / "b1"))
    spark.createDataFrame(b2, PAGES_DDL).coalesce(1).write.parquet(str(indir / "b2"))

    stream = (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(indir / "*"))
    )
    out = str(tmp_path / "dedup_out")
    q = (
        stream_dedup_first_seen(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out).toPandas()
    # exactly one row per distinct fingerprint, duplicates suppressed
    assert got["fp"].is_unique
    n_distinct_texts = base["text"].dropna().map(
        lambda t: " ".join(t.lower().split())
    ).nunique()
    assert len(got) == n_distinct_texts


def test_stream_sessionize_gap_splitting(spark, tmp_path):
    """In-batch gap splitting: sessions separated by more than the gap
    close and emit; per-session counts/spans match the batch
    lag+running-sum sessionization semantics. The trailing open session
    stays in state (no emission without a later batch/timeout)."""
    import datetime as dt

    import pandas as pd

    from pcornet_data_curation_spark.streaming.stateful import stream_sessionize

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def m(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # user 1: session A (3 events), 60-min gap, session B (2 events), open tail
        (1, m(0)), (1, m(5)), (1, m(10)),
        (1, m(70)), (1, m(75)),
        (1, m(200)),
        # user 2: one closed session (2 events), open tail
        (2, m(0)), (2, m(20)),
        (2, m(300)),
    ]
    indir = str(tmp_path / "ev_in")
    spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(1).write.parquet(indir)

    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(indir)
    out = str(tmp_path / "sess_out")
    q = (
        stream_sessionize(stream, gap_minutes=30, watermark="10 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    # u1 A and B close by in-batch gaps; u1's m(200) singleton closes
    # via EVENT-TIME TIMEOUT (watermark = m(300)-10min passes
    # m(200)+gap in the availableNow cleanup batch). u2's tail at
    # m(300) stays open: its timeout m(330) is beyond the watermark.
    assert got["user_id"].tolist() == [1, 1, 1, 2]
    assert got["events_n"].tolist() == [3, 2, 1, 2]
    spans = (
        (got["session_end"] - got["session_start"]).dt.total_seconds() / 60
    ).tolist()
    assert spans == [10.0, 5.0, 0.0, 20.0]
    assert got["session_start"].iloc[0] == pd.Timestamp(t0)


def test_stream_sessionize_late_events_merge(spark, tmp_path):
    """Cross-batch out-of-order arrivals (the case watermarks exist
    for) MERGE into the open session instead of regressing it.

    Old-bug scenario this pins down: batch 2 delivers m(95) while the
    open session's last is m(100); an unconditional `last = t` would
    regress last to 95, making batch 3's m(128) look like a >30-min
    gap and emit a session with session_end < session_start. The merge
    fold keeps (start=min, last=max), so 95 extends the session
    backwards and 128 extends it forwards. A batch-3 straggler at
    m(20) — more than the gap before the open start — emits as its own
    session (documented divergence: its batch-twin neighbor closed in
    batch 1 and append-mode output is immutable)."""
    import datetime as dt

    from pcornet_data_curation_spark.streaming.stateful import stream_sessionize

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def m(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    indir = str(tmp_path / "ev_in")
    out = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "ckpt")

    def drain(batch_rows):
        spark.createDataFrame(
            [(1, m(x)) for x in batch_rows], "user_id long, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(indir)
        stream = spark.readStream.schema("user_id long, ts timestamp").parquet(indir)
        q = (
            stream_sessionize(stream, gap_minutes=30, watermark="2 hours")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain([0, 10, 100])   # emits (0,10,2); open (100,100,1)
    drain([95])           # late: merges -> open (95,100,2)
    drain([20, 128, 300]) # 20 early-emits; 128 merges; 300 closes (95,128,3)

    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values("session_start")
        .reset_index(drop=True)
    )
    mins = lambda c: [(x - t0).total_seconds() / 60 for x in got[c]]
    assert mins("session_start") == [0.0, 20.0, 95.0]
    assert mins("session_end") == [10.0, 20.0, 128.0]
    assert got["events_n"].tolist() == [2, 1, 3]
    # invariant the old fold violated: end never precedes start
    assert (got["session_end"] >= got["session_start"]).all()


def test_stream_sessionize_late_chain_transitive_merge(spark, tmp_path):
    """ADVICE r3 regression: a late run that CHAINS up to the open
    session must merge transitively. Open session start=m(100),
    gap=30; batch 2 delivers [55, 80]. The old per-event
    classification saw 55 < 100-30 and stranded it as a spurious
    early session BEFORE 80 merged and pulled start down — but
    55–80–100 is one session (each hop ≤ gap), exactly what the
    batch-sorted twin computes. The combined interval gap-merge must
    produce a single (55, 100, 3) session and no early emission."""
    import datetime as dt

    from pcornet_data_curation_spark.streaming.stateful import stream_sessionize

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def m(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    indir = str(tmp_path / "ev_in")
    out = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "ckpt")

    def drain(batch_rows):
        spark.createDataFrame(
            [(1, m(x)) for x in batch_rows], "user_id long, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(indir)
        q = (
            stream_sessionize(
                spark.readStream.schema("user_id long, ts timestamp").parquet(indir),
                gap_minutes=30,
                watermark="2 hours",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain([100])      # open (100,100,1)
    drain([55, 80])   # late chain: merges transitively -> open (55,100,3)
    drain([200])      # >gap after 100: closes (55,100,3), opens (200)

    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values("session_start")
        .reset_index(drop=True)
    )
    mins = lambda c: [(x - t0).total_seconds() / 60 for x in got[c]]
    assert mins("session_start") == [55.0]
    assert mins("session_end") == [100.0]
    assert got["events_n"].tolist() == [3]


def test_stream_metrics_observed_per_batch(spark, tmp_path):
    """observe() metrics: one row per micro-batch in stream_metrics,
    whose sums equal the sink's actual record/keep/scrub counts — the
    streaming analog of verdict_summary."""
    import os

    indir = str(tmp_path / "pages_in")
    # 4 input files at maxFilesPerTrigger=8 -> at least one batch;
    # write in two chunks to encourage multiple batches
    pages_df(spark, 200, partitions=2).write.parquet(indir)
    pages_df(spark, 200, partitions=2).write.mode("append").parquet(indir)

    cfg = PipelineConfig(output_root=str(tmp_path / "out"), n_buckets=4)
    sink = run_stream_once(spark, indir, cfg)
    got = spark.read.parquet(sink)
    metrics = spark.read.parquet(os.path.join(cfg.output_root, "stream_metrics")).toPandas()
    assert len(metrics) >= 1
    assert metrics["records"].sum() == got.count()
    assert metrics["kept"].sum() == got.where("keep").count()
    assert metrics["scrub_hits"].sum() == got.where("scrub_hit").count()
    # batch ids are unique (exactly-once accounting)
    assert metrics["batch_id"].is_unique

    # exact dedup is now stream-supported (stateful first-seen,
    # test_stream_curate_with_dedup_flag_and_drop); only NEAR-dup mode
    # remains batch-only: clear error, not silent wrong data
    import pytest as _pytest

    from pcornet_data_curation_spark.streaming import curate_stream
    with _pytest.raises(ValueError, match="stream_neardup_flag_batch"):
        curate_stream(spark, indir, PipelineConfig(
            output_root=str(tmp_path / "x"), dedup="flag", dedup_method="near"))


def test_stream_curate_with_dedup_flag_and_drop(spark, tmp_path):
    """cfg.dedup wired into the stream (r3 task #8): the stateful
    first-seen operator flags duplicate content across micro-batches;
    'drop' additionally folds the flag into keep inside curate — the
    batch stage's downstream semantics with a first-seen survivor."""
    import datetime as dt

    import pytest

    from pcornet_data_curation_spark.streaming.curate_stream import curate_stream

    t = dt.datetime(2026, 1, 1, 12, 0, 0)
    body = ("genuinely substantive sentence " * 30).strip()
    rows1 = [
        (f"https://ex.com/a", t, None, body, "en"),
        (f"https://ex.com/b", t, None, body + " variant two distinct", "en"),
    ]
    rows2 = [
        (f"https://ex.com/c", t, None, body, "en"),          # dup of /a, later batch
        (f"https://ex.com/d", t, None, "tiny.", "en"),       # unique, fails rules
    ]
    ddl = "url string, warc_ts timestamp, html binary, text string, lang string"
    indir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain(rows, cfg):
        spark.createDataFrame(rows, ddl).coalesce(1).write.mode("append").parquet(indir)
        q = (
            curate_stream(spark, indir, cfg)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    cfg = PipelineConfig(output_root=str(tmp_path / "o"), n_buckets=4, dedup="drop")
    drain(rows1, cfg)
    drain(rows2, cfg)

    got = spark.read.parquet(out).toPandas().set_index("url")
    assert not got.loc["https://ex.com/a", "exact_dup"]      # first seen survives
    assert got.loc["https://ex.com/c", "exact_dup"]          # cross-batch duplicate
    assert not got.loc["https://ex.com/b", "exact_dup"]
    assert not got.loc["https://ex.com/d", "exact_dup"]
    assert not got.loc["https://ex.com/c", "keep"]           # drop folds into keep
    # the survivor's verdict matches the batch pipeline's rule verdict
    # for the same content (dedup never changes a survivor's keep)
    batch = (
        curate(
            spark.createDataFrame(rows1 + rows2, ddl),
            PipelineConfig(output_root=str(tmp_path / "b"), n_buckets=4),
        )
        .toPandas()
        .set_index("url")
    )
    assert got.loc["https://ex.com/a", "keep"] == batch.loc["https://ex.com/a", "keep"]

    # near-dup mode on a stream is refused loudly
    with pytest.raises(ValueError, match="stream_neardup_flag_batch"):
        curate_stream(
            spark, indir,
            PipelineConfig(output_root=str(tmp_path / "o2"), n_buckets=4,
                           dedup="drop", dedup_method="near"),
        )


def test_stream_neardup_flag_batch_store(spark, tmp_path):
    """Streaming near-dedup recipe (r4 verdict task #3): per-batch
    MinHash banding against a persisted signature store inside
    foreachBatch. Batch 2's near-duplicate of a batch-1 doc is flagged
    (cross-batch, store probe); a within-batch near-dup pair flags the
    larger id; unrelated docs never flag; a replayed batch_id is
    idempotent (no self-matching against its own store partition)."""
    from pcornet_data_curation_spark.operators.dedup import unpersist_deps
    from pcornet_data_curation_spark.streaming.neardup_stream import (
        stream_neardup_flag_batch,
    )

    store = str(tmp_path / "store")
    base = ("the quick brown fox jumps over the lazy dog near the old river "
            "bank while autumn leaves drift slowly down onto the cold water "
            "surface in the pale morning light of early november ") * 3
    ddl = "url string, text string"

    def run(rows, bid):
        bdf = spark.createDataFrame(rows, ddl)
        out = stream_neardup_flag_batch(bdf, bid, store, threshold=0.7)
        pdf = out.toPandas().set_index("url")
        unpersist_deps(out)
        return pdf

    b1 = run(
        [
            ("https://ex.com/a", base),
            ("https://ex.com/b", "completely different content about pyspark "
                                 "partitioning strategies and shuffle behavior "
                                 "at terabyte scale with adaptive execution " * 4),
            # within-batch near-dup pair: /a survives (min id), /a2 flags
            ("https://ex.com/a2", base + " tiny trailing addition"),
        ],
        0,
    )
    assert not b1.loc["https://ex.com/a", "near_dup"]
    assert b1.loc["https://ex.com/a2", "near_dup"]        # within-batch
    assert not b1.loc["https://ex.com/b", "near_dup"]

    b2 = run(
        [
            ("https://ex.com/c", base + " slightly changed tail words"),  # near-dup of /a
            ("https://ex.com/d", "yet another unrelated document on duckdb "
                                 "oracle construction and value hash parity "
                                 "checks across engines and dialects " * 4),
        ],
        1,
    )
    assert b2.loc["https://ex.com/c", "near_dup"]          # cross-batch via store
    assert not b2.loc["https://ex.com/d", "near_dup"]

    # replay batch 1 (failure recovery): identical result, no
    # self-match against its own partially-written store partition
    b2r = run(
        [
            ("https://ex.com/c", base + " slightly changed tail words"),
            ("https://ex.com/d", "yet another unrelated document on duckdb "
                                 "oracle construction and value hash parity "
                                 "checks across engines and dialects " * 4),
        ],
        1,
    )
    assert b2r["near_dup"].to_dict() == b2["near_dup"].to_dict()

    # store holds only survivors: /a2 and /c (flagged) never entered
    import os as _os

    sigs = spark.read.parquet(_os.path.join(store, "sigs")).toPandas()
    assert set(sigs["_id"]) == {
        "https://ex.com/a", "https://ex.com/b", "https://ex.com/d",
    }
