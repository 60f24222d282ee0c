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
