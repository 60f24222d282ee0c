"""Duplicate-span REMOVAL — the exact-substring-dedup family member
that edits documents instead of flagging them (Lee et al. 2022's
suffix-array dedup reduced to deterministic fixed blocks: the common
block-hash reproduction of the method).

A document is split into consecutive `block_tokens`-word blocks (the
last block may be shorter). Every block whose normalized text occurs
anywhere else in the corpus keeps exactly ONE global occurrence — the
minimum (id, block_idx) — and all other occurrences are removed; the
document is reassembled from its surviving blocks with single spaces.
Whitespace is normalized in the output (the dedup family's standard
normalization); docs with no removed blocks still come back
normalized, which keeps the transform idempotent.

Scale shape for 10^12 docs: explode (id, idx, block) rows → ONE
groupBy(block) whose partial aggregation absorbs hot boilerplate
blocks map-side (min(struct(id, idx)) is combinable) → equi-join the
keeper back on the block text → one doc-keyed aggregation rebuilds the
text. Two keyed shuffles, no self-join, no pair explosion; a block
repeated in 10^9 docs reduces to one row per input partition before
the exchange. The reassembly collects only each doc's OWN surviving
blocks (bounded by document size). Everything is JVM Column algebra —
no UDF — and the whole transform is reproduced exactly by a DuckDB
oracle (queries.span_dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcornet_data_curation_spark.operators.textanalysis import WS


def block_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_tokens: int = 25,
) -> DataFrame:
    """(id, text_deduped, blocks_n, removed_blocks_n): the input with
    globally duplicated token blocks removed (first occurrence by
    (id, block_idx) survives). NULL/empty text → empty string, 0/0."""
    b = block_tokens
    norm = F.trim(F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), WS, " "))
    toks = F.when(F.length(norm) == 0, F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )
    n = F.size(toks)
    n_blocks = F.ceil(n / F.lit(float(b))).cast("int")
    blocks = F.transform(
        F.sequence(F.lit(0), F.greatest(n_blocks - 1, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i * b + 1, b)),
    )
    blocks = F.when(n > 0, blocks).otherwise(F.array().cast("array<string>"))
    base = df.select(F.col(id_col).alias("_id"), blocks.alias("_blocks"))
    # group + join key is the 8-byte xxhash64 of the block, not the
    # ~150-byte block string: halves the shuffle-key bytes and the
    # compare cost on this operator's hottest exchange. The block text
    # rides only the exploded side (needed for reassembly); the keeper
    # side is (hash, min-(id,idx)) only. 64-bit collisions (~n²/2⁶⁵)
    # would at worst drop a non-duplicate block — negligible at any
    # realistic corpus size and identical in kind to every hash-dedup
    # family member here.
    exploded = base.select(
        "_id", F.posexplode("_blocks").alias("_idx", "_block")
    ).withColumn("_bh", F.xxhash64("_block"))
    keeper = exploded.groupBy("_bh").agg(
        F.min(F.struct(F.col("_id"), F.col("_idx"))).alias("_k")
    )
    survivors = (
        exploded.join(keeper, "_bh")
        .where((F.col("_id") == F.col("_k._id")) & (F.col("_idx") == F.col("_k._idx")))
        .select("_id", "_idx", "_block")
    )
    rebuilt = survivors.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("_idx"), F.col("_block")))),
                lambda s: s["_block"],
            ),
            " ",
        ).alias("text_deduped"),
        F.count(F.lit(1)).alias("_kept_n"),
    )
    totals = base.select("_id", F.size("_blocks").alias("blocks_n"))
    out = totals.join(rebuilt, "_id", "left").na.fill({"text_deduped": "", "_kept_n": 0})
    return out.select(
        F.col("_id").alias(id_col),
        "text_deduped",
        "blocks_n",
        (F.col("blocks_n") - F.col("_kept_n")).cast("long").alias("removed_blocks_n"),
    )
