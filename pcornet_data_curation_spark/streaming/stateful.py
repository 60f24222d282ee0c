"""Stateful / windowed streaming operators (engine extension — the
reference is strictly batch, SURVEY §2.9; these cover the streaming
surface a web-scale ingest needs).

* windowed_lang_counts — event-time tumbling-window aggregation with a
  watermark for late data (the %n_pct-per-period report, streamified).
* stream_dedup_first_seen — custom stateful operator via
  applyInPandasWithState: emits only the FIRST occurrence of each
  content fingerprint across micro-batches; state = fingerprints seen,
  keyed by fingerprint (so state is a single-row marker per key and
  the shuffle is by fingerprint — no global structure).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_DDL = "fp long, url string, warc_ts timestamp"
DEDUP_STATE_DDL = "seen boolean"


def windowed_lang_counts(
    pages_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time window counts per declared lang, tolerating
    `watermark` of lateness (late rows beyond it are dropped, enabling
    state cleanup — required for an unbounded 10^12-doc stream)."""
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(F.count(F.lit(1)).alias("record_n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "record_n",
        )
    )


def stream_dedup_first_seen(pages_stream: DataFrame) -> DataFrame:
    """First-seen exact dedup across the whole stream: rows whose
    whitespace/case-normalized fingerprint was already emitted in ANY
    earlier micro-batch are dropped. State per fingerprint is one
    boolean — O(distinct docs) cluster-wide, sharded by the groupBy key.
    """
    ws = "[ \\t\\n\\r\\f\\x0B]+"
    fp = F.xxhash64(F.lower(F.trim(F.regexp_replace(F.col("text"), ws, " "))))
    keyed = pages_stream.where(F.col("text").isNotNull()).select(
        fp.alias("fp"), "url", "warc_ts"
    )

    def dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return  # fingerprint already emitted in a previous batch
        first = None
        for pdf in pdfs:
            cand = pdf.sort_values(["warc_ts", "url"]).head(1)
            first = cand if first is None else pd.concat([first, cand]).sort_values(
                ["warc_ts", "url"]
            ).head(1)
        state.update((True,))
        if first is not None:
            yield first[["fp", "url", "warc_ts"]]

    return keyed.groupBy("fp").applyInPandasWithState(
        dedup,
        outputStructType=DEDUP_OUT_DDL,
        stateStructType=DEDUP_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
