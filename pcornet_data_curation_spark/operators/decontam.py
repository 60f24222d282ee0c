"""Benchmark decontamination — flag training documents that overlap an
evaluation/benchmark set by shared word k-grams (the GPT-3 appendix-C /
Llama-style 13-gram collision test, reduced to its flaggable core).

This is a first-class training-data-pipeline operator, not a reference
port: the reference's analog is the valueset membership join
(broadcast lookup table → per-record flag, potential_code_errors.sas
valueset checks), which is exactly the plan shape used here.

Scale design for 10^12 training docs × a benchmark of ~10^5-10^7
grams: the benchmark gram set is the SMALL side — it broadcasts, so
the corpus never shuffles; each doc's distinct k-gram hashes stream
through a BroadcastHashJoin probe and collapse back to one row per
document via a map-side-combinable count. Above
`broadcast_max_grams` the join falls back to a hash-partitioned
equi-join on the 8-byte gram hash (both sides shuffle (gram, id)
pairs only — never text). Gram hashing is xxhash64 engine-side; the
SQL oracle joins on the gram STRINGS, which is equality-equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcornet_data_curation_spark.operators.textanalysis import WS, word_kgram_col


def _distinct_gram_hashes(col, k: int):
    toks = F.split(F.trim(F.regexp_replace(F.lower(col), WS, " ")), " ")
    n = F.size(toks)
    return F.when(
        n >= k,
        F.array_distinct(F.transform(word_kgram_col(toks, n, k), lambda s: F.xxhash64(s))),
    ).otherwise(F.array().cast("array<bigint>"))


def contamination_flags(
    docs: DataFrame,
    bench: DataFrame,
    k: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    broadcast_max_grams: int = 50_000_000,
    max_grams_per_doc: int = 2_000,
) -> DataFrame:
    """Per training document: how many of its distinct word k-grams
    appear anywhere in the benchmark set, and a contaminated flag
    (any overlap). One row per input doc, hit docs AND clean docs —
    the caller filters or joins the verdict as needed.

    bench is the evaluation-set DataFrame (only `bench_text_col` is
    read). Case- and whitespace-insensitive, matching the dedup
    family's normalization.
    """
    bench_grams = (
        bench.where(F.col(bench_text_col).isNotNull())
        .select(F.explode(_distinct_gram_hashes(F.col(bench_text_col), k)).alias("gram"))
        .distinct()
    )
    # join-strategy routing from a CHEAP estimate: a doc count (column-
    # pruned scan, no shingling) times a per-doc gram bound — NOT a
    # count() of the gram projection itself, which would pay the whole
    # tokenize+shingle pass once for the estimate and again for the
    # join (measured 2× the query cost at sf0.1)
    n_bench_docs = bench.count()
    marked = bench_grams.withColumn("_hit", F.lit(1))
    if n_bench_docs * max_grams_per_doc <= broadcast_max_grams:
        marked = F.broadcast(marked)

    # ONE shingle pass: grams_n rides the exploded rows and the probe
    # is a LEFT join against the (broadcast) marked gram set, so hits
    # and totals come out of a single doc-keyed aggregation. The
    # previous shape read a shared `base` projection twice (hits
    # explode + totals size) — two full tokenize+shingle passes over
    # the corpus, the dominant cost of this operator (5.9 s → 3.1 s
    # at sf0.1 local[32], ~1.9×). explode_outer keeps zero-gram (empty/short) docs as
    # one NULL-gram row that matches nothing.
    exploded = docs.select(
        F.col(id_col).alias("_id"),
        _distinct_gram_hashes(F.coalesce(F.col(text_col), F.lit("")), k).alias("grams"),
    ).select(
        "_id",
        F.size("grams").alias("grams_n"),
        F.explode_outer("grams").alias("gram"),
    )
    out = (
        exploded.join(marked, "gram", "left")
        .groupBy("_id", "grams_n")
        .agg(F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("contaminated_grams_n"))
    )
    return out.select(
        F.col("_id").alias(id_col),
        "grams_n",
        F.col("contaminated_grams_n").cast("long").alias("contaminated_grams_n"),
        (F.col("contaminated_grams_n") > 0).alias("contaminated"),
    )


def decontaminate_remove(
    docs: DataFrame,
    bench: DataFrame,
    k: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    broadcast_max_grams: int = 50_000_000,
    max_grams_per_doc: int = 2_000,
) -> DataFrame:
    """Span-REMOVAL mode of benchmark decontamination (Dolma/FineWeb
    style): instead of flagging the whole document, every token
    covered by a benchmark-colliding k-gram is removed and the rest of
    the document is kept — contaminated docs survive minus the leaked
    span. One row per input doc: (id, text_decontaminated, tokens_n,
    removed_tokens_n, contaminated).

    Scale shape: the benchmark gram set broadcasts (same routing as
    contamination_flags) and token rows never exist as a relation —
    gram ANCHOR positions explode (ONE tokenize+shingle pass, the
    dominant cost) → broadcast-probe → hit anchors collapse to ONE
    small int-array per contaminated doc → that tiny frame joins back
    doc-keyed (AQE broadcasts it when contamination is sparse, the
    production case) → covered-index expansion, token filtering, and
    text reassembly are all per-doc ARRAY algebra inside the same
    projection. No token-level shuffle anywhere: the only wide ops are
    the anchor-hit groupBy (hits only) and the doc-keyed rate join.
    The token array is recomputed on the join side rather than
    persisted — two normalize passes total; caching a tokenized
    10^12-doc corpus would cost more than the recompute. All JVM
    Column algebra, no UDF."""
    bench_grams = (
        bench.where(F.col(bench_text_col).isNotNull())
        .select(F.explode(_distinct_gram_hashes(F.col(bench_text_col), k)).alias("gram"))
        .distinct()
    )
    n_bench_docs = bench.count()
    if n_bench_docs * max_grams_per_doc <= broadcast_max_grams:
        bench_grams = F.broadcast(bench_grams)

    norm = F.trim(
        F.regexp_replace(F.lower(F.coalesce(F.col(text_col), F.lit(""))), WS, " ")
    )
    toks = F.when(F.length(norm) == 0, F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )
    base = docs.select(F.col(id_col).alias("_id"), toks.alias("_toks"))
    # anchor i covers tokens [i, i+k): NON-distinct grams here — every
    # occurrence of a leaked gram marks its own span
    n = F.size(F.col("_toks"))
    grams = base.select(
        "_id",
        F.posexplode(
            F.when(
                n >= k,
                F.transform(word_kgram_col(F.col("_toks"), n, k), lambda s: F.xxhash64(s)),
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("_i", "gram"),
    )
    hits = (
        grams.join(bench_grams, "gram")
        .groupBy("_id")
        .agg(F.collect_set("_i").alias("_anchors"))
    )
    covered = F.coalesce(
        F.array_sort(
            F.array_distinct(
                F.flatten(
                    F.transform(F.col("_anchors"), lambda a: F.sequence(a, a + (k - 1)))
                )
            )
        ),
        F.array().cast("array<int>"),
    )
    return (
        base.join(hits, "_id", "left")
        .withColumn("_covered", covered)
        .select(
            F.col("_id").alias(id_col),
            F.array_join(
                F.filter(
                    F.col("_toks"),
                    lambda t, i: ~F.array_contains(F.col("_covered"), i),
                ),
                " ",
            ).alias("text_decontaminated"),
            F.size("_toks").alias("tokens_n"),
            F.size("_covered").cast("long").alias("removed_tokens_n"),
            (F.size("_covered") > 0).alias("contaminated"),
        )
    )
