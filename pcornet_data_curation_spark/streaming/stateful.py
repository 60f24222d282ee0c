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
* stream_sessionize — gap-based session windows per user via
  applyInPandasWithState + event-time timeout: the streaming twin of
  the batch lag+running-sum sessionization (queries.sessionize_events).
  State per user = ONE open session triple; closed sessions emit as
  soon as a larger gap arrives in-batch, or via watermark timeout when
  the stream goes quiet — O(active users) state, never O(events).
  Late-but-within-watermark events arriving in a LATER micro-batch
  MERGE into the open session (start=min, last=max) instead of
  regressing it; see stream_sessionize for the exact rules and the
  documented divergences from the batch twin.
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


SESSION_OUT_DDL = (
    "user_id long, session_start timestamp, session_end timestamp, events_n long"
)
SESSION_STATE_DDL = "start_us long, last_us long, n long"
_US = 1_000_000


def stream_sessionize(
    events_stream: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessionization over an unbounded event stream.

    Semantics match the batch sessionize (queries.sessionize_events):
    a session closes when the next event for the user is more than
    `gap_minutes` later. Sessions that close INSIDE a micro-batch emit
    immediately; the trailing open session is held in state (one triple
    per user) and emitted by event-time timeout once the watermark
    passes last_event + gap — so quiet users' state is reclaimed and
    total state is O(active users).

    Out-of-order handling (events arriving in a LATER micro-batch with
    ts at or before the open session's last event — the case
    watermarks exist for):

    * within the open session's span, or within `gap` of its start:
      MERGE — start = min(start, t), last = max(last, t), n += 1; the
      gap test always compares against the running max, so a late
      event never regresses the session or splits it spuriously;
    * more than `gap` BEFORE the open session's start: it can never
      merge, so it forms its own (possibly multi-event) session and
      emits at the end of the batch.

    Residual divergences from the batch twin (which sorts the complete
    log globally): (a) a late event landing within `gap` of a session
    that was ALREADY emitted in an earlier batch emits as a separate
    session rather than re-opening it — append-mode output is
    immutable; (b) the early-session emission in the second rule
    cannot merge with yet-later arrivals. Both affect only events
    later than their neighbors by more than a micro-batch, and never
    lose events.
    """
    gap_us = gap_minutes * 60 * _US
    ev = events_stream.withWatermark(ts_col, watermark).select(
        F.col(user_col).alias("user_id"), F.col(ts_col).alias("ts")
    )

    def sessionize(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def out(rows):
            return pd.DataFrame(
                {
                    "user_id": [key[0]] * len(rows),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in rows],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in rows],
                    "events_n": [n for _, _, n in rows],
                }
            )

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield out([(start, last, n)])
            return
        parts = [pdf["ts"] for pdf in pdfs if len(pdf)]
        if not parts:
            return
        ts = (
            pd.concat(parts)
            .sort_values()
            .astype("datetime64[us]")
            .astype("int64")
            .to_numpy()
        )
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        closed = []
        # run of late events > gap BEFORE the open session's start: they
        # can never merge with it; batch-sorted order means they are a
        # contiguous prefix of ts, so one builder suffices
        early = None
        for t in ts:
            t = int(t)
            if start is not None and t < start - gap_us:
                if early is None:
                    early = [t, t, 1]
                elif t - early[1] > gap_us:
                    closed.append(tuple(early))
                    early = [t, t, 1]
                else:
                    early[1] = t
                    early[2] += 1
                continue
            if start is None:
                start, last, n = t, t, 1
            elif t > last + gap_us:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                # merge: a late event extends the session backwards or
                # lands inside it; last only ever moves FORWARD, so the
                # gap test above always compares against the running max
                if t < start:
                    start = t
                if t > last:
                    last = t
                n += 1
        if early is not None:
            closed.append(tuple(early))
        state.update((start, last, n))
        # event-time timeout: fires when the watermark passes the gap
        state.setTimeoutTimestamp(last // 1000 + gap_minutes * 60 * 1000)
        if closed:
            yield out(closed)

    return ev.groupBy("user_id").applyInPandasWithState(
        sessionize,
        outputStructType=SESSION_OUT_DDL,
        stateStructType=SESSION_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
