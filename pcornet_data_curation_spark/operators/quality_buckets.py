"""CCNet-style quality bucketing — split each group's documents into
head/middle/tail tiers by a quality (or perplexity) score (Wenzek et
al. 2020 §4.3: per-language LM-perplexity terciles; training recipes
then sample by tier, e.g. keep head+middle, downsample tail).

The operator is SCORE-AGNOSTIC: the corpus CLI (`corpus --op tier`)
feeds it the curated table's pandas-UDF perplexity column
(operators/score.py) grouped by lang_pred — CCNet's exact shape, run
POST-curation because tier thresholds are a corpus-level statistic
and the curation pipeline processes resumable buckets — while the
oracle-checked registry query feeds it the pure-JVM composite quality
score (textanalysis.quality_score); the bucketing algebra is
identical.

Reference analog: the percentile ladder of the %cont/%t_cont macros
(edc_report.sas continuous-variable profiling) turned from a REPORT
into a PARTITIONING decision, the same way CCNet turns the perplexity
distribution into tier boundaries.

Scale shape for 10^12 docs: thresholds are a per-group aggregation
over (group, score) pairs — 16-byte rows, never text — producing one
row per group; that tiny frame broadcasts back and the bucket label is
a when-chain in the corpus's own projection, so the corpus itself
NEVER shuffles. Exact percentile (`exact=True`, the oracle-checked
mode) buffers each group's scores in its aggregation state — fine up
to ~10^8 rows per group; above that use the default `exact=False`,
which routes through approx_percentile (bounded-state quantile sketch,
tunable `accuracy`) — the production mode at web scale, where a tier
boundary off by sketch error is immaterial (CCNet itself cuts on
approximate thirds).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEAD_MIDDLE_TAIL = ("head", "middle", "tail")
TERCILES = (1.0 / 3.0, 2.0 / 3.0)


def score_buckets(
    df: DataFrame,
    score_col: str,
    group_col: str | None = None,
    cuts: Sequence[float] = TERCILES,
    labels: Sequence[str] = HEAD_MIDDLE_TAIL,
    exact: bool = False,
    accuracy: int = 10_000,
    output_col: str = "bucket",
) -> DataFrame:
    """The input with `output_col` added: the label of the per-group
    quantile band the row's score falls in (score <= q(cuts[0]) ->
    labels[0], <= q(cuts[1]) -> labels[1], ..., else labels[-1]).
    CCNet orientation — LOWER score = FIRST label — so pass perplexity
    (lower is better) directly for head/middle/tail semantics, or flip
    `labels` for a higher-is-better score. NULL scores get a NULL
    bucket; NULL groups form their own group (null-safe join). A group
    whose scores are all equal lands entirely in labels[0] (every
    quantile collapses onto the single value) — degenerate but
    deterministic.
    """
    if len(labels) != len(cuts) + 1:
        raise ValueError("need exactly len(cuts)+1 labels")
    s = F.col(score_col)
    gcols = [group_col] if group_col is not None else []
    pfn = (
        (lambda c, p: F.percentile(c, F.lit(p)))
        if exact
        else (lambda c, p: F.approx_percentile(c, F.lit(p), F.lit(accuracy)))
    )
    # the threshold frame is DERIVED FROM df, so join its group column
    # under a fresh name — joining df[g] against th[g] is a trivially-
    # true self-join predicate that only works through Spark's
    # dataset-id ambiguity repair (warns, and breaks when the lineage
    # tag is lost)
    th = df.groupBy(
        *[F.col(gc).alias("_qb_grp") for gc in gcols]
    ).agg(*[pfn(s, p).alias(f"_q{i}") for i, p in enumerate(cuts)])
    if group_col is None:
        joined = df.crossJoin(F.broadcast(th))
    else:
        joined = df.join(
            F.broadcast(th),
            on=F.col(group_col).eqNullSafe(F.col("_qb_grp")),
        ).drop("_qb_grp")
    bucket = F.when(s.isNull(), F.lit(None).cast("string"))
    for i in range(len(cuts)):
        bucket = bucket.when(s <= F.col(f"_q{i}"), F.lit(labels[i]))
    bucket = bucket.otherwise(F.lit(labels[-1]))
    return joined.withColumn(output_col, bucket).drop(
        *[f"_q{i}" for i in range(len(cuts))]
    )
