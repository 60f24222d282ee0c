"""HTML → text extraction — the step that produces the corpus's
`text` column from the raw crawl payload (north rule: "byte-identical
extracted text per url").

Reference analog: the code/text normalization family (the reference
derives analysis columns from raw fields with deterministic string
transforms, data_curation_base.sas compress/strip chains); here the
raw field is the page markup.

The extractor is deliberately a DETERMINISTIC regex pipeline, not a
DOM parser: script/style/comment blocks drop, tags strip, the common
entities decode, whitespace collapses. That makes it (a) pure JVM
Column algebra — whole-stage codegen, no UDF, no Python in the hot
path at 10^12 pages — and (b) bit-reproducible across engines, so the
whole transform is value-hash-checked against a DuckDB oracle running
the identical replacement chain (queries.extract_text). A DOM parser
would be neither. Case variants of the dropped blocks are matched
with explicit [sS][cC]... classes — never `(?i)` — per the engine's
Java∩RE2 dialect rule (a unicode-aware (?i) diverges between
engines; see functions/scrub.py).

Entity order is load-bearing: `&amp;` decodes LAST so that encoded
entities (`&amp;lt;`) come out as their literal text (`&lt;`) instead
of double-decoding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pcornet_data_curation_spark.operators.textanalysis import WS  # one ws class everywhere

# (?s) = dotall so blocks spanning lines drop; explicit case classes.
# <head> drops FIRST (title/meta are markup, not document text — and
# head-resident script/style go with it); body-resident script/style
# and comments drop next, then tags strip. The head open tag requires
# '>' or whitespace right after the name so HTML5 <header> blocks —
# which ARE document text — never match (script/style have no such
# longer-tag collisions).
_HEAD_RE = "(?s)<[hH][eE][aA][dD](>|[ \\t\\n\\r][^>]*>).*?</[hH][eE][aA][dD][ \\t\\n\\r]*>"
_SCRIPT_RE = "(?s)<[sS][cC][rR][iI][pP][tT][^>]*>.*?</[sS][cC][rR][iI][pP][tT]>"
_STYLE_RE = "(?s)<[sS][tT][yY][lL][eE][^>]*>.*?</[sS][tT][yY][lL][eE]>"
_COMMENT_RE = "(?s)<!--.*?-->"
_TAG_RE = "<[^>]*>"

_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # LAST — see module docstring
)


def extract_text_col(html_col: Column) -> Column:
    """Column: extracted plain text of a UTF-8 html payload (binary or
    string); NULL html → NULL."""
    # cast covers binary (implicit UTF-8 decode) and string inputs
    s = html_col.cast("string")
    out = F.regexp_replace(s, _HEAD_RE, " ")
    out = F.regexp_replace(out, _SCRIPT_RE, " ")
    out = F.regexp_replace(out, _STYLE_RE, " ")
    out = F.regexp_replace(out, _COMMENT_RE, " ")
    out = F.regexp_replace(out, _TAG_RE, " ")
    for ent, ch in _ENTITIES:
        out = F.regexp_replace(out, ent, ch)
    return F.trim(F.regexp_replace(out, WS, " "))


def extract_text(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(id, text_extracted) for a table carrying an html payload."""
    return df.select(
        F.col(id_col), extract_text_col(F.col(html_col)).alias("text_extracted")
    )


def missing_text_filled_col(
    text_col: str = "text", html_col: str = "html"
) -> Column:
    """Column for cfg.extract_missing_text, SHARED by the batch curate
    and the streaming dedup path so the two cannot drift: text filled
    from html only when text is NULL and html is present. Evaluate it
    in the SAME projection that derives extraction_ok from the
    ORIGINAL text column — a row whose text we derived ourselves is
    consistent by construction (the weaker tag-strip-only consistency
    probe would false-flag entity-bearing derived text as a mismatch
    if it ran against the filled value)."""
    return F.when(
        F.col(text_col).isNull() & F.col(html_col).isNotNull(),
        extract_text_col(F.col(html_col)),
    ).otherwise(F.col(text_col))
