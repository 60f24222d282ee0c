"""Checkpoint manifest — per-bucket resume without recomputation.

Reference analog: the incremental progress dataset updated after every
query (data_curation_base.sas:2942-2993) — a restart of the SAS
package re-runs everything; this engine instead records per-bucket
completion in a JSON manifest next to the output so a restarted run
skips completed url-hash buckets entirely (north rule: "resumable from
checkpoint with per-partition lineage + metrics").

Atomicity: manifest writes go to a temp file then os.replace (atomic
on POSIX). Data writes are idempotent per bucket because the curated
table is partitioned by bucket and written with dynamic partition
overwrite — a re-run of an unfinished bucket replaces only that
bucket's directory.
"""

from __future__ import annotations

import json
import os
import time


class Manifest:
    FILENAME = "_manifest.json"

    def __init__(self, root: str, n_buckets: int, data: dict | None = None):
        self.root = root
        self.path = os.path.join(root, self.FILENAME)
        self.data = data or {"n_buckets": n_buckets, "buckets": {}, "reports": {}}
        if self.data.get("n_buckets") != n_buckets:
            raise ValueError(
                f"manifest n_buckets={self.data.get('n_buckets')} != config n_buckets={n_buckets}; "
                "bucket function changed — start a fresh output_root"
            )

    @classmethod
    def load_or_init(cls, root: str, n_buckets: int) -> "Manifest":
        os.makedirs(root, exist_ok=True)
        path = os.path.join(root, cls.FILENAME)
        if os.path.exists(path):
            with open(path) as f:
                return cls(root, n_buckets, json.load(f))
        return cls(root, n_buckets)

    def save(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.data, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    # -- bucket state -------------------------------------------------
    def done_buckets(self) -> list[int]:
        return sorted(
            int(k) for k, v in self.data["buckets"].items() if v.get("status") == "done"
        )

    def pending_buckets(self) -> list[int]:
        done = set(self.done_buckets())
        return [b for b in range(self.data["n_buckets"]) if b not in done]

    def mark_done(self, bucket: int, rows: int, kept: int) -> None:
        self.data["buckets"][str(bucket)] = {
            "status": "done",
            "rows": rows,
            "kept": kept,
            "finished_at": time.time(),
        }

    def mark_report(self, name: str) -> None:
        self.data["reports"][name] = {"finished_at": time.time()}
