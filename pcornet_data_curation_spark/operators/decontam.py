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

    Scale shape mirrors contamination_flags (the benchmark gram set
    broadcasts; the corpus shuffles only doc-keyed): gram ANCHOR
    positions explode → broadcast-probe → each hit expands to its k
    covered positions (k rows per hit, k=13) → distinct → one anti-join
    removes covered tokens → one doc-keyed aggregation reassembles the
    text in token order. Reuses the span-dedup reassembly discipline
    (sort-by-index collect per doc, bounded by document size); all JVM
    Column algebra, no UDF."""
    bench_grams = (
        bench.where(F.col(bench_text_col).isNotNull())
        .select(F.explode(_distinct_gram_hashes(F.col(bench_text_col), k)).alias("gram"))
        .distinct()
    )
    n_bench_docs = bench.count()
    marked = bench_grams.withColumn("_hit", F.lit(1))
    if n_bench_docs * max_grams_per_doc <= broadcast_max_grams:
        marked = F.broadcast(marked)

    norm = F.trim(
        F.regexp_replace(F.lower(F.coalesce(F.col(text_col), F.lit(""))), WS, " ")
    )
    toks = F.when(F.length(norm) == 0, F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )
    base = docs.select(F.col(id_col).alias("_id"), toks.alias("_toks"))
    tokens = base.select("_id", F.posexplode("_toks").alias("_idx", "_tok"))
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
    removed = (
        grams.join(marked, "gram")
        .select("_id", F.explode(F.sequence(F.col("_i"), F.col("_i") + (k - 1))).alias("_idx"))
        .distinct()
    )
    kept = tokens.join(removed, ["_id", "_idx"], "left_anti")
    rebuilt = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("_idx"), F.col("_tok")))),
                lambda s: s["_tok"],
            ),
            " ",
        ).alias("text_decontaminated"),
        F.count(F.lit(1)).alias("_kept_n"),
    )
    totals = base.select("_id", F.size("_toks").alias("tokens_n"))
    out = totals.join(rebuilt, "_id", "left").na.fill(
        {"text_decontaminated": "", "_kept_n": 0}
    )
    return out.select(
        F.col("_id").alias(id_col),
        "text_decontaminated",
        "tokens_n",
        (F.col("tokens_n") - F.col("_kept_n")).cast("long").alias("removed_tokens_n"),
        (F.col("tokens_n") > F.col("_kept_n")).alias("contaminated"),
    )
