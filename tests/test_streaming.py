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
