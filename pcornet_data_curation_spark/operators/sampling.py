"""Corpus-shaping operators for training-data pipelines: deterministic
stratified sampling (rebalance over-represented languages/domains) and
token-budget shard packing (group documents into ~N-token training
shards).

Reference analog: the reference's per-stratum denominators and
superpopulation percentages (%n_pct superpop, data_curation_base.sas)
define the SHARES; these operators act on them. Both are pure Column
algebra with exact DuckDB oracles.

Determinism contract: sampling uses a content-independent uniform
u(id) = first 8 bytes of md5(id || ':' || seed) scaled to [0,1) — the
same engine-portable trick as fingerprint_md5 — so a resumed or
re-partitioned run keeps EXACTLY the same rows (no rand(), no
partition-dependent sampling like df.sample at 10^12 scale where input
splits shift between runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_U_DENOM = float(1 << 32)


def uniform_hash_col(id_col, seed: int = 0):
    """Deterministic uniform in [0,1) from an id: the first 8 hex chars
    of md5(id:seed) as a 32-bit integer / 2^32. Stable across engines
    (md5 is md5 everywhere), runs, and partitionings."""
    h = F.md5(F.concat(id_col.cast("string"), F.lit(f":{seed}")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(_U_DENOM)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Keep each row with its stratum's rate, decided by the
    deterministic uniform above — the 'downsample over-represented
    strata' step of corpus curation. rates maps stratum value → keep
    probability; unlisted strata (and NULL) use default_rate.

    Scale: zero shuffles — a literal when-chain over strata (strata
    sets are small: languages, top-level domains) and one hash per
    row, all inside codegen. Filtering happens at the scan when the
    source supports predicate pushdown of the stratum column.
    """
    rate = F.lit(default_rate)
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(float(r))).otherwise(rate)
    return df.where(uniform_hash_col(F.col(id_col), seed) < rate)


def hash_split(
    df: DataFrame,
    splits: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 0,
    col_name: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: the md5(id:seed)
    uniform is compared against the cumulative split boundaries in
    sorted-name order, so every row lands in exactly one split and the
    assignment survives re-partitioning, resume, and engine changes
    (the leakage-free property a training pipeline needs — a doc must
    never migrate between train and eval across runs). splits maps
    name → fraction; fractions must sum to 1 (±1e-9). Zero shuffles —
    one hash + when-chain inside codegen."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bad = {k: v for k, v in splits.items() if not 0.0 < v <= 1.0}
    if bad:
        # {'train': 1.5, 'val': -0.5} sums to 1 but silently empties
        # 'val' — reject out-of-range fractions explicitly
        raise ValueError(f"split fractions must be in (0, 1], got {bad}")
    u = uniform_hash_col(F.col(id_col), seed)
    expr = None
    acc = 0.0
    names = sorted(splits)
    for name in names[:-1]:
        acc += splits[name]
        expr = (
            F.when(u < F.lit(acc), F.lit(name))
            if expr is None
            else expr.when(u < F.lit(acc), F.lit(name))
        )
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(col_name, expr)


def domain_temperature_sample(
    df: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    seed: int = 0,
) -> DataFrame:
    """Temperature-sampled corpus mixing: keep each document of domain
    d with probability (n_min / n_d)^(1-alpha), so the EXPECTED kept
    count per domain is proportional to n_d^alpha — the temperature-
    sampling law multilingual/multi-source training mixes use (alpha=1
    keeps everything, alpha=0 equalizes all domains to ~n_min docs,
    alpha in between flattens the long-tail-domain skew). Rates are
    anchored at the smallest domain (rate exactly 1.0 there), so the
    transform never tries to keep more than exists.

    Unlike stratified_sample (caller-provided per-stratum rates), the
    rates here are DERIVED from the corpus itself: one tiny
    groupBy(domain) count (domains are bounded — this is the same
    cardinality class as the reference's %n_pct reference-table
    domains), its min taken on the driver-free plan side via a global
    window over the domain-count frame, broadcast back onto the
    corpus as a domain equi-join. The corpus itself never shuffles;
    the keep decision is the engine's standard deterministic
    md5(id:seed) uniform, so a resumed run keeps exactly the same
    rows.

    Returns the input plus (domain_n, keep_rate, keep) — callers
    filter on `keep`; keeping the columns makes the decision auditable
    (the lineage-report convention used across this repo).
    """
    counts = df.groupBy(F.col(domain_col).alias("_dom")).agg(
        F.count(F.lit(1)).alias("domain_n")
    )
    # global min over the (tiny, domain-bounded) counts frame; the
    # empty-frame Window warning class does not apply — this window
    # runs over the aggregated frame, never the corpus
    w = Window.partitionBy()
    rated = counts.select(
        "_dom",
        "domain_n",
        F.pow(
            F.min("domain_n").over(w).cast("double") / F.col("domain_n"),
            F.lit(1.0 - alpha),
        ).alias("keep_rate"),
    )
    u = uniform_hash_col(F.col(id_col), seed)
    return (
        df.join(
            F.broadcast(rated),
            df[domain_col].eqNullSafe(rated["_dom"]),
            "left",
        )
        .drop("_dom")
        .withColumn("keep", u < F.col("keep_rate"))
    )


def pack_token_shards(
    df: DataFrame,
    tokens_col: str,
    target_tokens: int,
    part_col: str,
    order_col: str = "doc_id",
) -> DataFrame:
    """Assign each document to a training shard of ~target_tokens,
    packing greedily in (part_col, order_col) order: shard boundaries
    fall where the running token total crosses a multiple of the
    target (shard_id = floor(cumulative_tokens_before_doc / target)).
    A document straddling a boundary stays in the earlier shard, so
    shards overshoot by at most one document — the standard
    sequence-packing approximation.

    Scale: ONE window partitioned by part_col (source/domain/date
    bucket) — the running sum is per-partition, so no global sort and
    no single-task bottleneck as long as part_col is reasonably
    bounded (the salted url-hash bucket of the curation pipeline is
    the natural choice at 10^12 docs). Shard ids are therefore
    (part, local_shard) pairs, not globally dense — global density
    would force a total order over the corpus.
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(tokens_col).cast("long")).over(w)
    before = cum - F.col(tokens_col).cast("long")
    return df.withColumn(
        "shard_id", F.floor(before / F.lit(float(target_tokens))).cast("long")
    ).withColumn("shard_tokens_before", before)
