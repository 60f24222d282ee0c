"""Streaming curation: the batch row-level transforms over a
Structured Streaming file source.

Because stages 1-5 are stateless per-row transforms (score → flags →
verdict → scrub), they lift unchanged onto a stream; only the report
family needs micro-batch aggregation (done per-batch via
foreachBatch in `run_stream_once`). Checkpointing is Spark's own
exactly-once file-sink checkpoint — the batch pipeline's manifest is
not used here.

Observability: the curated stream carries `observe()` metrics
(records / kept / scrub_hits per micro-batch) — the streaming analog
of the batch pipeline's verdict_summary — captured by a
StreamingQueryListener and written to <output>/stream_metrics, so a
long-running ingest exposes the same per-partition-of-time lineage
the batch manifest gives per bucket.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

from pcornet_data_curation_spark.config import PipelineConfig
from pcornet_data_curation_spark.datagen.pages import PAGES_DDL
from pcornet_data_curation_spark.plans.pipeline import curate

OBSERVATION_NAME = "curation"
STREAM_METRICS_DDL = (
    "batch_id long, records long, kept long, scrub_hits long"
)


def curate_stream(
    spark: SparkSession, input_dir: str, cfg: PipelineConfig
) -> DataFrame:
    """readStream over a parquet directory of pages → curated stream
    (same columns as the batch curated table)."""
    if cfg.dedup != "off":
        # global dedup needs the whole corpus (groupBy + join over all
        # rows ever seen) — a batch operation by construction. The
        # streaming counterpart is stateful first-seen suppression.
        raise ValueError(
            "cfg.dedup is a batch-only stage; for streams use "
            "streaming.stateful.stream_dedup_first_seen"
        )
    stream = (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    return curate(stream, cfg)


class _MetricsListener(StreamingQueryListener):
    """Collects the observe() metrics of every micro-batch. Driver-side
    list of one small row per batch — O(batches), never row data."""

    def __init__(self) -> None:
        self.rows: list[tuple[int, int, int, int]] = []
        self.terminated = False

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        om = event.progress.observedMetrics
        if OBSERVATION_NAME in om:
            m = om[OBSERVATION_NAME]
            self.rows.append(
                (
                    event.progress.batchId,
                    int(m["records"] or 0),
                    int(m["kept"] or 0),
                    int(m["scrub_hits"] or 0),
                )
            )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self.terminated = True


def run_stream_once(
    spark: SparkSession, input_dir: str, cfg: PipelineConfig
) -> str:
    """Drain all available input once (Trigger.AvailableNow) into a
    parquet sink with an exactly-once checkpoint; returns sink path.
    Per-micro-batch observe() metrics land in <output>/stream_metrics."""
    out = os.path.join(cfg.output_root, "stream_curated")
    ckpt = os.path.join(cfg.output_root, "stream_checkpoint")
    observed = curate_stream(spark, input_dir, cfg).observe(
        OBSERVATION_NAME,
        F.count(F.lit(1)).alias("records"),
        F.sum(F.col("keep").cast("long")).alias("kept"),
        F.sum(F.col("scrub_hit").cast("long")).alias("scrub_hits"),
    )
    listener = _MetricsListener()
    spark.streams.addListener(listener)
    try:
        q = (
            observed.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # Python listener events are delivered ASYNCHRONOUSLY — progress
        # rows can land after awaitTermination returns. Event order is
        # guaranteed (progress before terminated), so waiting for the
        # termination event means every batch's metrics have arrived.
        import time as _time

        deadline = _time.monotonic() + 30.0
        while not listener.terminated and _time.monotonic() < deadline:
            _time.sleep(0.1)
        if not listener.terminated:
            import logging

            logging.getLogger(__name__).warning(
                "stream_metrics may be INCOMPLETE: the listener's "
                "termination event did not arrive within 30s of "
                "awaitTermination; %d batch rows captured so far",
                len(listener.rows),
            )
    finally:
        spark.streams.removeListener(listener)
    spark.createDataFrame(listener.rows, STREAM_METRICS_DDL).write.mode(
        "append"
    ).parquet(os.path.join(cfg.output_root, "stream_metrics"))
    return out
