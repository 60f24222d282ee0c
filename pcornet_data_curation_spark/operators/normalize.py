"""Metrics normalization — melt every report into one long table.

Reference analog: normalization.sas (%_recordn, :261-404; final
assembly :945-961) un-pivots ~330 query outputs into a single
`dc_norm` dataset (dc_name, table, variable, category, statistic,
resultc/resultn) that the data-check report consumes.

Here `melt_report` unpivots any report DataFrame with `stack` (pure
Catalyst, one projection — no UDF, no driver loop), and
`assemble_metrics` unions the melted reports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

METRICS_SCHEMA = (
    "dc_name string, variable string, category string, statistic string, "
    "resultc string, resultn double"
)


def melt_report(
    report: DataFrame,
    dc_name: str,
    id_cols: list[str],
    value_cols: list[str] | None = None,
    variable: str = "",
) -> DataFrame:
    """Unpivot `value_cols` (default: all non-id columns) into
    (dc_name, variable, category, statistic, resultc, resultn).

    `category` = the concatenated id-column values ('|'-joined when
    multiple, like the reference's cross-category keys); numeric values
    land in resultn, everything in resultc (reference stringifies
    counts then parses back, data_curation_base.sas:1109 /
    normalization.sas:337-349 — we keep both representations).
    """
    if value_cols is None:
        value_cols = [c for c in report.columns if c not in id_cols]
    numeric = {
        f.name
        for f in report.schema.fields
        if isinstance(f.dataType, (T.NumericType, T.BooleanType))
    }
    cat = (
        F.concat_ws("|", *[F.coalesce(F.col(c).cast("string"), F.lit("NULL")) for c in id_cols])
        if id_cols
        else F.lit("")
    )
    stacked = report.select(
        cat.alias("category"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("statistic"),
                        F.col(c).cast("string").alias("resultc"),
                        (
                            F.col(c).cast("double")
                            if c in numeric
                            else F.lit(None).cast("double")
                        ).alias("resultn"),
                    )
                    for c in value_cols
                ]
            )
        ).alias("_s"),
    )
    return stacked.select(
        F.lit(dc_name).alias("dc_name"),
        F.lit(variable).alias("variable"),
        "category",
        F.col("_s.statistic").alias("statistic"),
        F.col("_s.resultc").alias("resultc"),
        F.col("_s.resultn").alias("resultn"),
    )


def extraction_consistent_col(html_col="html", text_col="text"):
    """Boolean Column: the stored text plausibly came from the stored
    html (stage-1 extraction check, SURVEY §7). Tag-stripped, whitespace-
    normalized html must contain the first 64 chars of the normalized
    text. NULL html or NULL/empty text → consistent (nothing to check).
    Pure Column algebra — decode + two regex passes, no UDF."""
    from pyspark.sql import functions as F

    ws = "[ \\t\\n\\r\\f\\x0B]+"
    norm_text = F.trim(F.regexp_replace(F.col(text_col), ws, " "))
    stripped_html = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.decode(F.col(html_col), "UTF-8"), "<[^>]*>", " "),
            ws,
            " ",
        )
    )
    probe = F.substring(norm_text, 1, 64)
    return (
        F.col(html_col).isNull()
        | F.col(text_col).isNull()
        | (F.length(norm_text) == 0)
        | stripped_html.contains(probe)
    )


def assemble_metrics(melted: list[DataFrame]) -> DataFrame:
    """Union all melted reports (reference final assembly,
    normalization.sas:945-961)."""
    out = melted[0]
    for m in melted[1:]:
        out = out.unionByName(m)
    return out
