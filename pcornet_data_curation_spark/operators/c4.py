"""C4 line-level cleaning — the line-EDITING stage of Raffel et al.
2020's C4 pipeline (§2.2), applied to line-structured text (the
extractor's output, extract_text_lines_col):

  - keep only lines ending in terminal punctuation (. ! ? or a
    closing double quote),
  - keep only lines with at least `min_words` words (C4 uses 5),
  - drop any line mentioning "javascript" (case-insensitive),
  - after line filtering, a page is kept only if at least
    `min_lines` lines survive (C4's "at least 3 sentences" page rule
    at line granularity).

This complements the DOC-level C4 rules the engine already has
(has_bad_phrase / has_curly_brace in functions/textcore.py, rule rows
in operators/rules.py — the reference's rule-predicate analog,
potential_code_errors.sas:310-344): those flag whole documents; this
stage edits them, removing boilerplate lines (nav, "read more",
cookie/JS nags) while keeping the prose.

Scale shape: per-row JVM Column algebra ONLY — one split, one
array-HOF filter, one join; no UDF, no shuffle, no state. At 10^12
docs this is a map-only stage that pipelines into the scan; it is
also stateless and therefore streaming-safe as-is (unlike the dedup
family). The lines array is referenced by two consumers (filter +
size) and Catalyst inlines the split into both — deliberate and fine:
split is cheap (the Catalyst-inlining rule of thumb in BENCH.md only
bans re-evaluating EXPENSIVE expressions like per-token hashing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pcornet_data_curation_spark.operators.textanalysis import WS

# line-internal whitespace (no \n — lines are already split on it);
# explicit class, engine-portable (same convention as textanalysis.WS)
LINE_WS = "[ \\t\\r\\f\\x0B]+"

# terminal punctuation a kept line must end with (C4: period,
# exclamation, question mark, or end-quotation mark)
TERMINAL_PUNCT = '[.!?"”]'

# case-insensitive via explicit lower() (never (?i) — the repo's
# Java-vs-RE2 unicode-case gotcha)
_JS_WORD = "javascript"


def _keep_line(line: Column, min_words: int) -> Column:
    """C4 keep-predicate for one trimmed line."""
    words = F.size(F.split(line, LINE_WS))
    return (
        (line != "")
        & (words >= min_words)
        & line.rlike(TERMINAL_PUNCT + "$")
        & ~F.lower(line).contains(_JS_WORD)
    )


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    min_lines: int = 3,
) -> DataFrame:
    """(id, text_clean, lines_n, lines_kept, keep): C4 line filtering
    over newline-structured text. `text_clean` is the surviving lines
    joined with '\\n' ('' when nothing survives); `keep` is the C4
    page-level verdict (>= min_lines surviving lines). Lines are
    trimmed before the predicate; empty lines never count toward
    lines_n (they are structure, not content)."""
    trimmed = F.filter(
        F.transform(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n"),
            lambda l: F.trim(F.regexp_replace(l, LINE_WS, " ")),
        ),
        lambda l: l != "",
    )
    kept = F.filter(trimmed, lambda l: _keep_line(l, min_words))
    return df.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias("text_clean"),
        F.size(trimmed).alias("lines_n"),
        F.size(kept).alias("lines_kept"),
        (F.size(kept) >= min_lines).alias("keep"),
    )


# ---------------------------------------------------------------------------
# C4's DEDUP stage: remove all but one occurrence of any three-sentence
# span (Raffel et al. 2020 §2.2 — "we discarded all but one of any
# three-sentence span occurring more than once in the data set").
# ---------------------------------------------------------------------------

# sentence-boundary markers: terminal punctuation followed by a space
# opens a new sentence. Applied AFTER whitespace collapse (runs are
# single spaces), each replacement keeps the punctuation and swaps the
# space for an ASCII record separator (chr 30). Any PRE-EXISTING
# chr-30 byte in the input (stray control-char mojibake) is stripped
# to a space BEFORE normalization — otherwise it would act as a bogus
# sentence boundary and mutate even duplicate-free documents.
# No capture groups — Java writes `$1`, RE2/DuckDB `\1`, so a
# capture-free chain is the only form both engines run verbatim.
_SEP = "\x1e"
SENT_STEPS: tuple[tuple[str, str], ...] = (
    ("\\. ", "." + _SEP),
    ("! ", "!" + _SEP),
    ("\\? ", "?" + _SEP),
)


def sentences_col(text_col: Column) -> Column:
    """Array of sentences of a text column (deterministic split at
    terminal-punctuation+space boundaries; punctuation retained, so
    joining the array back with ' ' reproduces the normalized text —
    normalization = WS collapse + chr-30 strip — byte-for-byte).
    NULL/empty → empty array."""
    cleaned = F.regexp_replace(F.coalesce(text_col, F.lit("")), _SEP, " ")
    norm = F.trim(F.regexp_replace(cleaned, WS, " "))
    marked = norm
    for pat, rep in SENT_STEPS:
        marked = F.regexp_replace(marked, pat, rep)
    return F.when(F.length(marked) == 0, F.array().cast("array<string>")).otherwise(
        F.split(marked, _SEP)
    )


def c4_sentence_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 3,
) -> DataFrame:
    """(id, text_deduped, sentences_n, windows_n, removed_sentences_n):
    corpus-wide removal of repeated `window`-sentence spans, C4's
    actual dedup semantics. Spans are OVERLAPPING (stride 1), so a
    duplicated passage is caught at ANY sentence alignment — the gap
    the fixed-block grid (spandedup.block_dedup) leaves at block
    boundaries. The globally-first occurrence of each span — minimum
    (doc id, anchor index) — is the keeper; every OTHER occurrence
    marks its `window` sentences for removal, and each document is
    reassembled from its unmarked sentences (a document with no
    repeated span comes back byte-identical to its normalized text).
    Documents with fewer than `window` sentences have no spans and are
    never edited.

    Scale shape (10^12 docs): sentence arrays stay inside per-row
    projections; only (id, anchor, span-hash) triples ever shuffle —
    one groupBy(span-hash) whose map-side partial absorbs hot
    boilerplate spans, one equi-join back on the hash, one doc-keyed
    collect of marked anchors (hit docs only — AQE broadcasts the
    marks frame when duplication is sparse, the production case), and
    the covered-index expansion + sentence filtering + reassembly are
    per-doc array algebra in one projection. Sentence text never rides
    a shuffle row: the span JOIN KEY is xxhash64 of the span text
    (8 bytes; a 64-bit collision at worst drops one non-duplicate
    span — the dedup family's standard trade, spandedup.py). All JVM
    Column algebra, no UDF. The sentence array is recomputed on the
    reassembly side rather than cached — two split passes total;
    caching a tokenized 10^12-doc corpus costs more than the recompute
    (same trade as decontam.decontaminate_remove).

    Reference analog: nodupkey dedup lifted to span granularity
    (data_curation_base.sas dedup passes); the remove-and-reassemble
    machinery mirrors decontam.decontaminate_remove.
    """
    if window < 1:
        raise ValueError("window must be >= 1 sentence")
    w = window
    base = df.select(
        F.col(id_col).alias("_id"), sentences_col(F.col(text_col)).alias("_sents")
    )
    n = F.size(F.col("_sents"))
    # one hash per anchor; _sents is a staged multi-referenced alias so
    # CollapseProject's guard keeps the split chain evaluated once per
    # row (the boilerplate.py staging rule), and the per-anchor slice
    # reads the staged array
    span_hashes = F.when(
        n >= w,
        F.transform(
            F.sequence(F.lit(0), n - w),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(F.col("_sents"), i + 1, w))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    wins = base.select("_id", F.posexplode(span_hashes).alias("_i", "_wh"))
    keeper = wins.groupBy("_wh").agg(
        F.min(F.struct(F.col("_id"), F.col("_i"))).alias("_k")
    )
    marks = (
        wins.join(keeper, "_wh")
        .where(~((F.col("_id") == F.col("_k._id")) & (F.col("_i") == F.col("_k._i"))))
        .groupBy("_id")
        .agg(F.collect_set("_i").alias("_anchors"))
    )
    covered = F.coalesce(
        F.array_sort(
            F.array_distinct(
                F.flatten(
                    F.transform(F.col("_anchors"), lambda a: F.sequence(a, a + (w - 1)))
                )
            )
        ),
        F.array().cast("array<int>"),
    )
    return (
        base.join(marks, "_id", "left")
        .withColumn("_covered", covered)
        .select(
            F.col("_id").alias(id_col),
            F.array_join(
                F.filter(
                    F.col("_sents"),
                    lambda s, i: ~F.array_contains(F.col("_covered"), i),
                ),
                " ",
            ).alias("text_deduped"),
            F.size("_sents").alias("sentences_n"),
            F.when(n >= w, n - w + 1).otherwise(F.lit(0)).cast("int").alias("windows_n"),
            F.size("_covered").cast("long").alias("removed_sentences_n"),
        )
    )
