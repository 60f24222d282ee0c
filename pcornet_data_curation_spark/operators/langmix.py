"""Per-line language-mix detection — the paragraph-level langid pass
of CCNet-style pipelines (Wenzek et al. 2020 run fastText per
PARAGRAPH and drop or split documents whose parts disagree): a crawl
page is often navigation in one language wrapped around content in
another, and a doc-level vote alone cannot see it.

Reuses the engine's stopword-marker vote (textanalysis._marker_hits —
exactly SQL-expressible, so the whole operator is value-hash-checked
in DuckDB) at two granularities: one vote for the document, one per
non-empty line, then per-doc aggregation of how many lines disagree
with the document vote. Lines whose vote is 'und' (no markers — too
short / non-prose) are excluded from the mismatch fraction, CCNet's
convention for unscorable paragraphs.

Scale shape: one line explode (the corpus's only row expansion), the
marker counts are JVM split-arithmetic per line, ONE doc-keyed
aggregation with map-side partials; the doc-level vote rides the
exploded rows as a carried column, so nothing joins back. Map +
one keyed shuffle, no UDF, no window.

Reference analog: the declared-vs-derived conformance compare
(lang vs lang_pred, rules.py declared_lang_mismatch) lifted to
intra-document granularity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pcornet_data_curation_spark.operators.textanalysis import _MARKERS, _marker_hits

LINE_WS = "[ \\t\\r\\f\\x0B]+"


def _vote(col: Column) -> Column:
    """Marker-argmax language vote for one text Column ('und' when no
    marker hits; first-wins tie break in _MARKERS order — identical to
    textanalysis.langid_heuristic's chain)."""
    hits = {lang: _marker_hits(col, ws) for lang, ws in _MARKERS.items()}
    best = F.greatest(*hits.values())
    pred = F.when(best <= 0, F.lit("und"))
    for lang, h in hits.items():
        pred = pred.when(h == best, F.lit(lang))
    return pred


def language_mix(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, doc_lang, lines_n, lines_scored_n, lines_mismatch_n,
    mix_frac): per-line language votes vs the document vote. mix_frac
    = mismatching / scored lines (0.0 when no line is scorable);
    lines are trimmed, empty lines dropped; NULL text → 'und', all
    zero."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(
        F.transform(
            F.split(c, "\n"), lambda l: F.trim(F.regexp_replace(l, LINE_WS, " "))
        ),
        lambda l: l != "",
    )
    base = df.select(
        F.col(id_col).alias("_id"),
        _vote(c).alias("doc_lang"),
        lines.alias("_lines"),
    )
    ex = base.select(
        "_id", "doc_lang", F.explode_outer("_lines").alias("_line")
    ).withColumn("_ll", F.when(F.col("_line").isNotNull(), _vote(F.col("_line"))))
    out = ex.groupBy("_id", "doc_lang").agg(
        F.count(F.col("_line")).cast("int").alias("lines_n"),
        F.sum((F.col("_ll").isNotNull() & (F.col("_ll") != "und")).cast("int"))
        .cast("int")
        .alias("lines_scored_n"),
        F.sum(
            (
                F.col("_ll").isNotNull()
                & (F.col("_ll") != "und")
                & (F.col("_ll") != F.col("doc_lang"))
            ).cast("int")
        )
        .cast("int")
        .alias("lines_mismatch_n"),
    )
    mix = F.when(
        F.col("lines_scored_n") > 0,
        F.col("lines_mismatch_n").cast("double")
        / F.col("lines_scored_n").cast("double"),
    ).otherwise(F.lit(0.0))
    return out.select(
        F.col("_id").alias(id_col),
        "doc_lang",
        "lines_n",
        "lines_scored_n",
        "lines_mismatch_n",
        mix.alias("mix_frac"),
    )
