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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pcornet_data_curation_spark.operators.textanalysis import WS


def _norm_tokens(text_col: str):
    """(normalized text, token array, token count) columns shared by
    both block builders; NULL/empty text → empty array."""
    norm = F.trim(F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), WS, " "))
    toks = F.when(F.length(norm) == 0, F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )
    return toks, F.size(toks)


def _dedup_blocks_rows(
    exploded: DataFrame, totals: DataFrame, id_col: str, sep: str = " "
) -> DataFrame:
    """Shared tail of the span-dedup family over (_id, _idx, _block)
    rows + (_id, blocks_n) totals: keep one global occurrence per
    block text — the minimum (id, block_idx) — and reassemble each doc
    from its surviving blocks. Group + join key is the 8-byte xxhash64
    of the block (halves shuffle-key bytes vs the ~150-byte string on
    this operator's hottest exchange); the block text rides only the
    exploded side. 64-bit collisions (~n²/2⁶⁵) would at worst drop a
    non-duplicate block — negligible and identical in kind to every
    hash-dedup family member here."""
    exploded = exploded.withColumn("_bh", F.xxhash64("_block"))
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
            sep,
        ).alias("text_deduped"),
        F.count(F.lit(1)).alias("_kept_n"),
    )
    out = totals.join(rebuilt, "_id", "left").na.fill({"text_deduped": "", "_kept_n": 0})
    return out.select(
        F.col("_id").alias(id_col),
        "text_deduped",
        "blocks_n",
        (F.col("blocks_n") - F.col("_kept_n")).cast("long").alias("removed_blocks_n"),
    )


def block_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_tokens: int = 25,
) -> DataFrame:
    """(id, text_deduped, blocks_n, removed_blocks_n): the input with
    globally duplicated token blocks removed (first occurrence by
    (id, block_idx) survives). NULL/empty text → empty string, 0/0.

    Plan shape (the CollapseProject/inlining lesson, round 6): the
    token array is STAGED as an attribute (referenced ≥3 times in the
    block builder, so the multi-reference guard keeps the regex+split
    evaluated once per row instead of once per BLOCK inside the slice
    lambda), the explode is posexplode_OUTER + a post-Generate null
    filter (a plain posexplode gets a `size(blocks) > 0` filter
    inferred above the scan — InferFiltersFromGenerate — which inlines
    the whole O(n_blocks·n_tokens) block expression a second time per
    row), and the totals branch computes blocks_n ARITHMETICALLY
    (ceil(n_tokens/b)) instead of materializing the block array again
    just to take its size. Measured 38.7 s → map-pass-bound at sf1.0."""
    b = block_tokens
    toks, n = _norm_tokens(text_col)
    b0 = df.select(F.col(id_col).alias("_id"), toks.alias("_toks"))
    n_attr = F.size(F.col("_toks"))
    n_blocks = F.ceil(n_attr / F.lit(float(b))).cast("int")
    blocks = F.when(
        n_attr > 0,
        F.transform(
            F.sequence(F.lit(0), F.greatest(n_blocks - 1, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i * b + 1, b)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = b0.select("_id", blocks.alias("_blocks"))
    exploded = base.select(
        "_id", F.posexplode_outer("_blocks").alias("_idx", "_block")
    ).where(F.col("_idx").isNotNull())
    totals = df.select(
        F.col(id_col).alias("_id"),
        F.ceil(n / F.lit(float(b))).cast("int").alias("blocks_n"),
    )
    return _dedup_blocks_rows(exploded, totals, id_col)


def _md5_token_hash(tok: Column) -> Column:
    """Engine-portable token hash (first 8 md5 hex digits as int64) —
    the same md5-uniform construction sampling.py uses for cross-engine
    determinism, so a DuckDB oracle reproduces the boundaries exactly."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")


def block_dedup_cdc(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    avg_block_tokens: int = 25,
    portable_boundaries: bool = False,
) -> DataFrame:
    """Content-defined twin of block_dedup (same output schema): block
    boundaries are ROLLING-HASH ANCHORS — a token opens a new block
    when hash(token) % avg_block_tokens == 0 (position 0 always does) —
    instead of a fixed stride. The fixed 25-token grid misses any
    duplicated span whose alignment differs between the two documents
    (offset by half a window, a duplicate survives); content-defined
    boundaries are a pure function of the token stream, so a shared
    span longer than ~2× the average block re-synchronizes onto
    identical blocks in BOTH documents regardless of offset — the
    content-defined-chunking reproduction of Lee et al. 2022's
    suffix-array exact-substring dedup.

    Block construction is ROW-based: one posexplode of the token
    array, one boundary hash per token, block ordinals as a per-doc
    running-sum window (partitioned by doc — state bounded by doc
    size), then the shared keeper machinery: one groupBy(block-hash)
    with map-side combine, one equi-join, one doc-keyed reassembly.
    (An array-HOF formulation was 169× slower at sf0.1: Catalyst's
    projection collapse inlines every reference to the anchor-index
    expression, re-hashing all tokens O(m) times per doc — see the
    inline comment.)

    portable_boundaries=True swaps the boundary hash from xxhash64
    (fastest, JVM) to the md5-prefix construction both engines share,
    which is how the registry entry span_dedup_cdc is value-hash-
    checked end-to-end against DuckDB; the machinery is otherwise
    byte-identical and the default stays xxhash64 for the hot path.
    """
    from pyspark.sql import Window

    p = avg_block_tokens
    toks, _ = _norm_tokens(text_col)
    tok_hash = _md5_token_hash if portable_boundaries else F.xxhash64
    # ROW-BASED block construction, deliberately: the array-HOF
    # formulation (anchor-index list + per-block slices) references
    # the anchor expression several times per block, and Catalyst's
    # projection collapse INLINES every reference — the per-token
    # hashing re-evaluates O(n·m) times per document (measured 333 s
    # vs ~4 s for the fixed grid at sf0.1; a staged-select variant
    # still collapsed to 11 plan copies). Exploding the tokens makes
    # every per-token value ROW DATA computed exactly once: posexplode
    # → one boundary hash per token → block id as a per-doc running
    # sum (window partitioned by doc, bounded by doc size) → block
    # text via the same sort-collect reassembly the family already
    # uses. groupBy(_id, _bord) reuses the window's doc-keyed
    # partitioning (no extra exchange).
    tokens = df.select(
        F.col(id_col).alias("_id"), F.posexplode(toks).alias("_tidx", "_tok")
    )
    bflag = (
        (F.col("_tidx") == 0) | (F.pmod(tok_hash(F.col("_tok")), F.lit(p)) == 0)
    ).cast("int")
    w = (
        Window.partitionBy("_id")
        .orderBy("_tidx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    blkd = tokens.select(
        "_id", "_tidx", "_tok", (F.sum(bflag).over(w) - 1).alias("_bord")
    )
    exploded = blkd.groupBy("_id", F.col("_bord").alias("_idx")).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("_tidx"), F.col("_tok")))),
                lambda s: s["_tok"],
            ),
            " ",
        ).alias("_block")
    )
    # totals ARITHMETICALLY from a staged token array (round 6): the
    # former exploded.groupBy(_id).count() re-evaluated the whole
    # explode + window + collect front a THIRD time (keeper and
    # survivors already evaluate it twice); blocks_n is just the
    # boundary-token count — 1 (position 0) + boundary hashes among
    # tokens 2..n — an O(n) array filter over the staged attribute,
    # one cheap map pass. Empty/NULL docs give 0 directly.
    t0 = df.select(F.col(id_col).alias("_id"), toks.alias("_toks"))
    n = F.size(F.col("_toks"))
    tail_bounds = F.size(
        F.filter(
            F.slice(F.col("_toks"), 2, F.greatest(n - 1, F.lit(0))),
            lambda t: F.pmod(tok_hash(t), F.lit(p)) == 0,
        )
    )
    totals = t0.select(
        "_id",
        F.when(n > 0, tail_bounds + 1).otherwise(F.lit(0)).cast("int").alias("blocks_n"),
    )
    return _dedup_blocks_rows(exploded, totals, id_col)


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide exact duplicate-LINE removal — the paragraph-dedup
    stage of CCNet/Dolma-style pipelines (boilerplate lines repeated
    across a crawl — nav bars, cookie banners, copyright footers —
    keep ONE global occurrence, the minimum (doc_id, line_idx); every
    other occurrence is cut and the document reassembled from its
    surviving lines with '\\n'). The natural unit here is the LINE the
    extractor emitted (extract_text_lines_col), not a token window —
    boilerplate repeats exactly at line granularity.

    Returns (id, text_deduped, lines_n, removed_lines_n); lines are
    trimmed and empty lines dropped (they carry no content and would
    otherwise all collide on ''), so the transform is idempotent.

    Scale shape is the span-dedup family's (_dedup_blocks_rows): lines
    explode to (id, idx, line) rows, ONE groupBy on the 8-byte line
    hash whose partial agg absorbs hot boilerplate map-side, one
    equi-join, one doc-keyed reassembly. Two keyed shuffles, no
    self-join; a line repeated in 10^9 docs reduces to one row per
    input partition before the exchange. Analog of the reference's
    nodupkey dedup (data_curation_base.sas) lifted to line granularity.
    """
    raw = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
    exploded = (
        df.select(F.col(id_col).alias("_id"), F.posexplode(raw).alias("_idx", "_l"))
        .select("_id", "_idx", F.trim(F.col("_l")).alias("_block"))
        .where(F.col("_block") != "")
    )
    totals = (
        df.select(F.col(id_col).alias("_id"))
        .join(exploded.groupBy("_id").count(), "_id", "left")
        .select("_id", F.coalesce(F.col("count"), F.lit(0)).cast("int").alias("blocks_n"))
    )
    out = _dedup_blocks_rows(exploded, totals, id_col, sep="\n")
    return out.select(
        id_col,
        "text_deduped",
        F.col("blocks_n").alias("lines_n"),
        F.col("removed_blocks_n").alias("removed_lines_n"),
    )
