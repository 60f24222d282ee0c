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

# the padding and split-count arithmetic are textanalysis's — ONE
# source of truth, so language_mix's vote can never drift from
# langid_heuristic's (the parity both docstrings promise)
from pcornet_data_curation_spark.operators.textanalysis import (
    _MARKERS,
    _marker_hits,
    _marker_hits_from_pad as _hits_from_pad,
    _marker_pad as _pad,
)

LINE_WS = "[ \\t\\r\\f\\x0B]+"


def _vote(col: Column) -> Column:
    """Marker-argmax language vote for one text Column ('und' when no
    marker hits; first-wins tie break in _MARKERS order — identical to
    textanalysis.langid_heuristic's chain). Single-Column form: the
    hit counts are inlined per reference (best + each when), so the
    12-split marker computation re-evaluates several times per value —
    fine for tests/one-off projections; the hot path (language_mix)
    stages hits as attributes instead, langid_heuristic's shape."""
    hits = {lang: _marker_hits(col, ws) for lang, ws in _MARKERS.items()}
    best = F.greatest(*hits.values())
    pred = F.when(best <= 0, F.lit("und"))
    for lang, h in hits.items():
        pred = pred.when(h == best, F.lit(lang))
    return pred


def _vote_from_attrs(prefix: str) -> Column:
    """The _vote when-chain over STAGED per-language hit attributes
    (cheap re-references; the expensive splits ran exactly once)."""
    best = F.greatest(*[F.col(prefix + lang) for lang in _MARKERS])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in _MARKERS:
        pred = pred.when(F.col(prefix + lang) == best, F.lit(lang))
    return pred


def language_mix(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, doc_lang, lines_n, lines_scored_n, lines_mismatch_n,
    mix_frac): per-line language votes vs the document vote. mix_frac
    = mismatching / scored lines (0.0 when no line is scorable);
    lines are trimmed, empty lines dropped; NULL text → 'und', all
    zero.

    Hits are staged as attributes at BOTH granularities (doc pad →
    4 hit columns → vote; line pad → 4 hit columns → vote): the
    single-Column _vote inlines the 12-split marker computation into
    every reference of `best` (≈5×) — measured as the dominant cost of
    this operator at sf1.0 (31 s); staging makes each split run once
    per doc + once per line, the langid_heuristic shape."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(
        F.transform(
            F.split(c, "\n"), lambda l: F.trim(F.regexp_replace(l, LINE_WS, " "))
        ),
        lambda l: l != "",
    )
    b0 = df.select(
        F.col(id_col).alias("_id"), lines.alias("_lines"), _pad(c).alias("_pad")
    )
    b1 = b0.select(
        "_id",
        "_lines",
        *[
            _hits_from_pad(F.col("_pad"), ws).alias(f"_h_{lang}")
            for lang, ws in _MARKERS.items()
        ],
    )
    base = b1.select("_id", "_lines", _vote_from_attrs("_h_").alias("doc_lang"))
    e0 = base.select("_id", "doc_lang", F.explode_outer("_lines").alias("_line"))
    e1 = e0.select(
        "_id",
        "doc_lang",
        "_line",
        F.when(F.col("_line").isNotNull(), _pad(F.col("_line"))).alias("_lpad"),
    )
    e2 = e1.select(
        "_id",
        "doc_lang",
        "_line",
        *[
            _hits_from_pad(F.col("_lpad"), ws).alias(f"_lh_{lang}")
            for lang, ws in _MARKERS.items()
        ],
    )
    ex = e2.withColumn(
        "_ll", F.when(F.col("_line").isNotNull(), _vote_from_attrs("_lh_"))
    )
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
