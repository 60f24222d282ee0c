"""Data checks — threshold rules over the normalized metrics.

Reference analog: edc_prep.sas (expected-output registry vs produced,
:56-125) + edc_report.sas (threshold checks -> exception rows with
severity, :865-944, 11280-11361). Checks are data: a registry of
(check_id, dc_name, statistic, op, threshold, severity) evaluated with
one join + Column algebra over the (small) metrics table.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    check_id: str
    description: str
    dc_name: str  # metrics dc_name to test
    statistic: str  # metrics statistic to test
    op: str  # exception when  observed OP threshold : lt|le|gt|ge
    threshold: float
    severity: str = "red"  # red | blue (reference severity coloring)
    category: str | None = None  # optional category filter


DEFAULT_CHECKS: tuple[Check, ...] = (
    Check("1.01", "keep rate implausibly low", "verdict_summary", "keep_pct", "lt", 10.0, "red"),
    Check("1.02", "keep rate implausibly high", "verdict_summary", "keep_pct", "gt", 99.5, "blue"),
    Check("2.01", "null url fraction", "pages_tag", "null_n", "gt", 0.0, "red", category="curated|url"),
    Check("2.02", "duplicate urls present", "url_unique", "dup_url_n", "gt", 0.0, "blue"),
    Check("3.01", "scrub hit-rate suspicious", "scrub_summary", "scrub_pct", "gt", 50.0, "blue"),
)


def expected_reports_check(
    produced: list[str], expected: list[str], spark
) -> DataFrame:
    """Completeness: expected report names vs produced (edc_prep.sas
    :80-125). Returns (dc_name, produced boolean)."""
    rows = [(name, name in set(produced)) for name in expected]
    return spark.createDataFrame(rows, "dc_name string, produced boolean")


def run_checks(metrics: DataFrame, checks: tuple[Check, ...] = DEFAULT_CHECKS) -> DataFrame:
    """Evaluate the registry → (check_id, description, dc_name,
    statistic, threshold, observed, exception, severity).

    Implemented as a broadcast join of the tiny check registry onto the
    metrics table + per-op boolean algebra; absent metrics produce
    observed=NULL, exception=false ('n/a handling for absent tables',
    edc_report.sas:11280-11361).
    """
    spark = metrics.sparkSession
    reg = spark.createDataFrame(
        [
            (c.check_id, c.description, c.dc_name, c.statistic, c.op, float(c.threshold), c.severity, c.category)
            for c in checks
        ],
        "check_id string, description string, dc_name string, statistic string, "
        "op string, threshold double, severity string, category string",
    )
    m = metrics.select(
        F.col("dc_name"), F.col("statistic"), F.col("category").alias("m_category"), F.col("resultn")
    )
    joined = F.broadcast(reg).join(
        m,
        (reg.dc_name == m.dc_name)
        & (reg.statistic == m.statistic)
        & (F.col("category").isNull() | (F.col("category") == F.col("m_category"))),
        "left",
    )
    obs = F.col("resultn")
    exc = (
        F.when(F.col("op") == "lt", obs < F.col("threshold"))
        .when(F.col("op") == "le", obs <= F.col("threshold"))
        .when(F.col("op") == "gt", obs > F.col("threshold"))
        .when(F.col("op") == "ge", obs >= F.col("threshold"))
        .otherwise(F.lit(False))
    )
    return joined.select(
        reg.check_id,
        reg.description,
        reg.dc_name,
        reg.statistic,
        reg.threshold,
        obs.alias("observed"),
        F.coalesce(exc, F.lit(False)).alias("exception"),
        reg.severity,
    ).orderBy("check_id")
