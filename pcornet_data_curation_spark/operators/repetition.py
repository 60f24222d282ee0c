"""Gopher's full in-document repetition ladder (Rae et al. 2022,
appendix A1.1): per document, the fraction of characters covered by
the MOST FREQUENT word n-gram for small n (top-2/3/4-gram) and the
fraction of characters inside DUPLICATED word n-grams for larger n
(dup-5..10-gram) — the nine repetition signals Gopher thresholds to
drop machine-generated / template spam.

The per-document scoring pipeline already carries two rungs of this
ladder as pandas-twin stats (functions/textcore.py
dup_ngram_char_frac / top_ngram_char_frac feed rules.py); this
operator computes ALL NINE rungs corpus-wide in ONE pass as pure JVM
Column algebra with a DuckDB oracle, for repetition audits and
threshold calibration over an existing table (the reference analog:
the %cont percentile profile the thresholds would be read from,
edc_report.sas continuous profiling).

Semantics match textcore exactly: tokens are the CASE-PRESERVING
whitespace-split words (textcore's tokenize() does not lowercase, so
thresholds calibrated from this operator see the same values the rule
engine sees; pass lowercase=True for the dedup family's case-blind
convention); `top_frac(n) = count(top gram) * chars(top gram) /
total_token_chars` (0.0 unless the top gram repeats; ties break to
the LARGEST gram string — textcore's max-by-(count, gram) with
space-joined strings, identical because tokens cannot contain a
space); `dup_frac(n)` counts each token position once (union of
covered positions) for grams occurring more than once. Docs shorter
than n tokens score 0.0 on rung n; spaces are not counted as
characters (denominator = sum of token lengths).

Scale shape for 10^12 docs: gram construction is ROW-wise — one token
posexplode, eight leads over a per-doc window (state bounded by doc
size), grams built INCREMENTALLY (gram_n = gram_{n-1} + ' ' + next
token, so the nine rungs cost nine concats per token, not nine
slice-copies per anchor), one explode to (doc, n, i, gram) rows —
then ONE groupBy(doc, n, gram) whose map-side partial collapses a
gram repeated k times within a partition to one row, ONE (doc, n)
aggregation, one doc-keyed join back for token lengths, and a
conditional-agg pivot; the coverage expansion and character sums are
per-(doc, n) array algebra inside projections. No UDF, no self-join.
An array-HOF formulation (per-anchor F.slice + concat_ws inside
transform lambdas) was measured 3-5x slower at sf0.01 — the
spandedup.block_dedup_cdc lesson again: multi-referenced non-trivial
array lambdas fall off the codegen fast path, row data is computed
exactly once.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcornet_data_curation_spark.operators.textanalysis import WS

TOP_NS = (2, 3, 4)
DUP_NS = (5, 6, 7, 8, 9, 10)


def gopher_repetition(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: Sequence[int] = TOP_NS,
    dup_ns: Sequence[int] = DUP_NS,
    lowercase: bool = False,
) -> DataFrame:
    """(id, top_{n}gram_char_frac... , dup_{n}gram_char_frac...): the
    Gopher repetition ladder, one row per input document."""
    all_ns = sorted(set(top_ns) | set(dup_ns))
    if not all_ns or min(all_ns) < 2:
        raise ValueError("repetition rungs must be n >= 2")

    c = F.coalesce(F.col(text_col), F.lit(""))
    if lowercase:
        c = F.lower(c)
    norm = F.trim(F.regexp_replace(c, WS, " "))
    toks = F.when(F.length(norm) == 0, F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )
    # staged multi-referenced aliases (the CollapseProject guard) so
    # the tokenize / length-map run once per row
    b0 = df.select(F.col(id_col).alias("_id"), toks.alias("_toks"))
    base = b0.select(
        "_id",
        "_toks",
        F.transform("_toks", lambda t: F.length(t)).alias("_lens"),
    ).select(
        "_id",
        "_toks",
        "_lens",
        F.aggregate("_lens", F.lit(0).cast("long"), lambda a, x: a + x).alias("_total"),
    )

    from pyspark.sql import Window

    n_max = max(all_ns)
    w = Window.partitionBy("_id").orderBy("_i")
    tokens = base.select("_id", F.posexplode("_toks").alias("_i", "_t"))
    leads = tokens.select(
        "_id",
        "_i",
        "_t",
        *[F.lead("_t", k).over(w).alias(f"_l{k}") for k in range(1, n_max)],
    )
    # incremental rungs: concat propagates the null lead past the doc
    # end, so gram_n is null exactly when fewer than n tokens remain
    gram_exprs: dict[int, object] = {}
    cur = F.col("_t")
    for k in range(1, n_max):
        cur = F.concat(cur, F.lit(" "), F.col(f"_l{k}"))
        if (k + 1) in all_ns:
            gram_exprs[k + 1] = cur
    arr = F.array(
        *[
            F.struct(
                F.lit(n).alias("n"), F.col("_i").alias("i"), gram_exprs[n].alias("g")
            )
            for n in all_ns
        ]
    )
    g = leads.select(
        "_id",
        F.explode(F.filter(arr, lambda x: x["g"].isNotNull())).alias("gr"),
    ).select(
        "_id",
        F.col("gr.n").alias("_n"),
        F.col("gr.i").alias("_i"),
        F.col("gr.g").alias("_g"),
    )
    counts = g.groupBy("_id", "_n", "_g").agg(
        F.count(F.lit(1)).alias("_c"), F.collect_list("_i").alias("_pos")
    )
    pern = counts.groupBy("_id", "_n").agg(
        F.max(
            F.when(
                F.col("_c") > 1,
                F.struct(F.col("_c").alias("c"), F.col("_g").alias("g")),
            )
        ).alias("_top"),
        F.flatten(
            F.collect_list(F.when(F.col("_c") > 1, F.col("_pos")))
        ).alias("_anchors"),
    )
    joined = pern.join(base.select("_id", "_lens", "_total"), "_id")
    covered = F.array_distinct(
        F.flatten(
            F.transform(
                F.col("_anchors"), lambda a: F.sequence(a, a + F.col("_n") - 1)
            )
        )
    )
    dup_chars = F.aggregate(
        covered,
        F.lit(0).cast("long"),
        lambda acc, p: acc + F.element_at(F.col("_lens"), p + 1),
    )
    top_chars = F.when(F.col("_top").isNull(), F.lit(0).cast("long")).otherwise(
        (
            F.col("_top.c")
            * (F.length(F.col("_top.g")) - (F.col("_n") - 1))
        ).cast("long")
    )
    nz = F.col("_total") > 0
    fr = joined.select(
        "_id",
        "_n",
        F.when(nz, top_chars.cast("double") / F.col("_total").cast("double"))
        .otherwise(F.lit(0.0))
        .alias("_topf"),
        F.when(nz, dup_chars.cast("double") / F.col("_total").cast("double"))
        .otherwise(F.lit(0.0))
        .alias("_dupf"),
    )
    aggs = [
        F.coalesce(
            F.max(F.when(F.col("_n") == n, F.col("_topf"))), F.lit(0.0)
        ).alias(f"top_{n}gram_char_frac")
        for n in top_ns
    ] + [
        F.coalesce(
            F.max(F.when(F.col("_n") == n, F.col("_dupf"))), F.lit(0.0)
        ).alias(f"dup_{n}gram_char_frac")
        for n in dup_ns
    ]
    out = fr.groupBy("_id").agg(*aggs)
    # docs with no gram rows at all (short/empty) come back all-zero
    ids = df.select(F.col(id_col).alias("_id"))
    filled = ids.join(out, "_id", "left").na.fill(
        {f"top_{n}gram_char_frac": 0.0 for n in top_ns}
        | {f"dup_{n}gram_char_frac": 0.0 for n in dup_ns}
    )
    return filled.withColumnRenamed("_id", id_col)
