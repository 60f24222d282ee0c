"""Streaming curation: the batch row-level transforms over a
Structured Streaming file source.

Because stages 1-5 are stateless per-row transforms (score → flags →
verdict → scrub), they lift unchanged onto a stream; only the report
family needs micro-batch aggregation (done per-batch via
foreachBatch in `run_stream_once`). Checkpointing is Spark's own
exactly-once file-sink checkpoint — the batch pipeline's manifest is
not used here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pcornet_data_curation_spark.config import PipelineConfig
from pcornet_data_curation_spark.datagen.pages import PAGES_DDL
from pcornet_data_curation_spark.plans.pipeline import curate


def curate_stream(
    spark: SparkSession, input_dir: str, cfg: PipelineConfig
) -> DataFrame:
    """readStream over a parquet directory of pages → curated stream
    (same columns as the batch curated table)."""
    stream = (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    return curate(stream, cfg)


def run_stream_once(
    spark: SparkSession, input_dir: str, cfg: PipelineConfig
) -> str:
    """Drain all available input once (Trigger.AvailableNow) into a
    parquet sink with an exactly-once checkpoint; returns sink path."""
    out = os.path.join(cfg.output_root, "stream_curated")
    ckpt = os.path.join(cfg.output_root, "stream_checkpoint")
    q = (
        curate_stream(spark, input_dir, cfg)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out
