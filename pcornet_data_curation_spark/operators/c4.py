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
