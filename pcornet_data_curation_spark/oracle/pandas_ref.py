"""Pandas reference pipeline — produces the 'reference labels' that the
Spark engine must reproduce (keep/drop F1 ≥ 0.99, byte-identical
scrubbed text per url; BASELINE.json metric).

Deliberately shares the scoring core (functions.textcore) and the
scrub pattern registry (functions.scrub) with the Spark path, but runs
them through an entirely separate, driver-local execution path — the
test asserts the distributed plan (partitioning, Arrow batching, JVM
regex engine) introduces no divergence.
"""

from __future__ import annotations

import pandas as pd

from pcornet_data_curation_spark.functions.scrub import scrub_series_py
from pcornet_data_curation_spark.functions.textcore import doc_stats_frame
from pcornet_data_curation_spark.operators import rules as R


def reference_verdicts(pages: pd.DataFrame, overrides: dict | None = None) -> pd.DataFrame:
    """pages (url, warc_ts, html, text, lang) → per-url reference labels
    (url, keep, flag_*, scrubbed_text)."""
    stats = doc_stats_frame(pages["text"])
    full = pd.concat([pages.reset_index(drop=True), stats.reset_index(drop=True)], axis=1)
    out = pd.DataFrame({"url": full["url"]})
    drop_any = pd.Series(False, index=full.index)
    for rule in R.active_rules(overrides):
        mask = R.violation_mask(rule, full).fillna(False).astype(bool)
        out[R.flag_name(rule)] = mask
        if rule.severity == R.SEV_DROP:
            drop_any = drop_any | mask
    out["keep"] = ~drop_any
    out["scrubbed_text"] = scrub_series_py(pages["text"].reset_index(drop=True))
    return out
