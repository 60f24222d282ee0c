"""Per-stage lineage / elapsed tracking.

Reference analog: the %elapsed(begin)/%elapsed(end) bracket around
every query, accumulating an `elapsed` dataset (query, start, end,
elapsed, cumulative) and a progress report
(data_curation_base.sas:2894-2995).

The tracker is driver-side (stage boundaries are driver events); rows
are tiny and written with the run manifest. Timestamps are wall-clock
by design — lineage is telemetry, not part of the deterministic
output contract.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field


@dataclass
class LineageRow:
    stage: str
    partition_id: int | None
    started_at: float
    ended_at: float
    elapsed_sec: float
    rows_in: int | None
    rows_out: int | None
    status: str


@dataclass
class LineageTracker:
    rows: list[LineageRow] = field(default_factory=list)
    _t0: float = field(default_factory=time.time)

    @contextmanager
    def stage(self, name: str, partition_id: int | None = None, rows_in: int | None = None):
        start = time.time()
        holder = {"rows_out": None}
        try:
            yield holder
        except Exception:
            end = time.time()
            self.rows.append(
                LineageRow(name, partition_id, start, end, end - start, rows_in, None, "failed")
            )
            raise
        end = time.time()
        self.rows.append(
            LineageRow(
                name, partition_id, start, end, end - start, rows_in, holder["rows_out"], "ok"
            )
        )

    def cumulative_sec(self) -> float:
        return time.time() - self._t0

    def to_records(self) -> list[dict]:
        return [
            {
                "stage": r.stage,
                "partition_id": r.partition_id,
                "started_at": r.started_at,
                "ended_at": r.ended_at,
                "elapsed_sec": r.elapsed_sec,
                "rows_in": r.rows_in,
                "rows_out": r.rows_out,
                "status": r.status,
            }
            for r in self.rows
        ]

    def to_df(self, spark):
        return spark.createDataFrame(
            self.to_records() or [],
            "stage string, partition_id int, started_at double, ended_at double, "
            "elapsed_sec double, rows_in long, rows_out long, status string",
        )
