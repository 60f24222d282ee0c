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

# ---------------------------------------------------------------------------
# Newline-preserving variant: block-element boundaries become '\n' so
# html-derived text feeds the LINE-structured signals (dup_line_metrics,
# bullet/terminal-punct line ratios, span-dedup line reassembly) with
# real lines instead of one collapsed line. The reference's analog
# invariant is that derived columns feed the rule engine with full
# fidelity (potential_code_errors.sas:310-344 normalizes but never
# destroys the structure the rules read). Source newlines in the
# markup are plain whitespace (HTML semantics) and collapse to spaces
# BEFORE the structural newlines are inserted from tags.
# ---------------------------------------------------------------------------

# block-level elements whose open/close tags terminate a line; longer
# names first so prefix pairs (pre/p) read unambiguously (both Java and
# RE2 resolve the alternation correctly either way).
_BLOCK_TAGS: tuple[str, ...] = (
    "blockquote", "section", "article", "header", "footer", "table",
    "pre", "div", "ul", "ol", "li", "tr", "br", "hr", "p",
    "h1", "h2", "h3", "h4", "h5", "h6",
)


def _ci(tag: str) -> str:
    """Case-insensitive regex for a tag name via explicit classes —
    never (?i), per the Java∩RE2 dialect rule (module docstring)."""
    return "".join(f"[{c}{c.upper()}]" if c.isalpha() else c for c in tag)


_BLOCK_ALT = "|".join(_ci(t) for t in _BLOCK_TAGS)
# close tag: </p >, </div>, ...; open tag: <p>, <div class=x>, <br/>.
# The open pattern requires '>' or ws-or-/ right after the name so
# <param>/<progress>/<html> never match (same guard as _HEAD_RE).
_BLOCK_CLOSE_RE = f"</(?:{_BLOCK_ALT})[ \\t\\n\\r]*>"
_BLOCK_OPEN_RE = f"<(?:{_BLOCK_ALT})(?:>|[ \\t\\n\\r/][^>]*>)"

# Ordered (pattern, replacement) chain shared VERBATIM by the Spark
# Column builder and the DuckDB oracle generator (queries._sql_extract
# _text_lines) so the two engines cannot drift. Every pattern is in the
# Java∩RE2 common dialect; '\n' appears only as the \n ESCAPE inside
# patterns (both engines decode it) and as a real newline in
# replacements (emitted as chr(10) on the SQL side).
LINES_STEPS: tuple[tuple[str, str], ...] = (
    (_HEAD_RE, " "),
    (_SCRIPT_RE, " "),
    (_STYLE_RE, " "),
    (_COMMENT_RE, " "),
    # source ws (incl. markup newlines) → space, BEFORE structural \n
    ("[ \\t\\n\\r\\f\\x0B]+", " "),
    (_BLOCK_CLOSE_RE, "\n"),
    (_BLOCK_OPEN_RE, "\n"),
    (_TAG_RE, " "),
    *_ENTITIES,
    ("[ ]+", " "),            # entity-introduced space runs
    ("[ ]*\\n[ ]*", "\n"),    # trim spaces around line boundaries
    ("\\n+", "\n"),           # collapse blank-line runs
    ("\\A[\\n ]+|[\\n ]+\\z", ""),  # outer trim (\A/\z: both dialects)
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


def extract_text_lines_col(html_col: Column) -> Column:
    """Column: extracted text with '\\n' at block-element boundaries
    (newline-preserving twin of extract_text_col; see LINES_STEPS).
    NULL html → NULL. Still a pure JVM regexp chain — codegen, no UDF."""
    out = html_col.cast("string")
    for pat, rep in LINES_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return out


def extract_text(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(id, text_extracted) for a table carrying an html payload."""
    return df.select(
        F.col(id_col), extract_text_col(F.col(html_col)).alias("text_extracted")
    )


def missing_text_filled_col(
    text_col: str = "text", html_col: str = "html", preserve_lines: bool = False
) -> Column:
    """Column for cfg.extract_missing_text, SHARED by the batch curate
    and the streaming dedup path so the two cannot drift: text filled
    from html only when text is NULL and html is present. Evaluate it
    in the SAME projection that derives extraction_ok from the
    ORIGINAL text column — a row whose text we derived ourselves is
    consistent by construction (the weaker tag-strip-only consistency
    probe would false-flag entity-bearing derived text as a mismatch
    if it ran against the filled value).

    preserve_lines=True derives via the newline-preserving chain
    (extract_text_lines_col) so filled text carries real line
    structure into the line-level signals; the flat chain remains the
    byte-compatibility default for callers pinned to it."""
    derive = extract_text_lines_col if preserve_lines else extract_text_col
    return F.when(
        F.col(text_col).isNull() & F.col(html_col).isNotNull(),
        derive(F.col(html_col)),
    ).otherwise(F.col(text_col))
