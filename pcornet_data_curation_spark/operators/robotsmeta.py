"""Robots meta-directive detection — surface `<meta name="robots">`
noindex/nofollow directives from raw page html so the pipeline can
respect publisher opt-outs at curation time (crawlers honor these at
fetch time; a curation engine re-processing stored WARCs must re-check
them itself — the C4/CCNet-class politeness stage).

Parsing contract (regex-shallow like the extraction chain, but
robots-convention-correct where it matters):

  * ALL `<meta>` tags are scanned; a tag is a robots tag iff its
    name attribute VALUE equals `robots` exactly (quoted or not) —
    a value-equality test, so `name="robots-extra"` and a
    `name=robots` substring inside some other attribute's VALUE never
    match (the attr is re-extracted per tag, leftmost `name=` wins);
  * directives from EVERY robots tag are combined, so the most
    restrictive wins — the rule real crawlers apply when a page
    carries several robots tags (`content="index"` + a later
    `content="noindex"` ⇒ noindex);
  * attribute order and quoting are free; values and the whitespace
    around `=` may span newlines (prettified html);
  * matching is ASCII-lowercased first (explicit lower(), never
    `(?i)` — the repo's Java-vs-RE2 unicode-case gotcha) and
    directive tokens are comma/whitespace-separated (token equality,
    never substring: `noindexfoo` is not an opt-out);
  * a `none` directive means noindex+nofollow.

Scale shape: one regexp_extract_all + per-tag array HOFs over one
column — map-only, zero exchanges, streaming-safe. html may be binary
(WARC payload) or string; binary is decoded as UTF-8 by the cast.

Reference analog: the per-record valid-flag derivations feeding the
rule engine (potential_code_errors.sas:310-344) — a surface predicate
computed once at scan and carried as an auditable flag.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# explicit whitespace class (no \s); includes \r\n — attributes and
# the '=' may be wrapped across lines in prettified html
_WS = "[ \\t\\r\\n]*"

# every meta tag; robots-ness is decided per tag by NAME_ATTR_RE
META_TAG_RE = "<meta[^>]*>"

# attribute value as a three-way quoted alternation; the unquoted
# class stops at whitespace INCLUDING newlines, quotes, '>', and '/'
# (self-closing tail), so a value never swallows tag syntax
_ATTR_VAL = "(?:\"([^\"]*)\"|'([^']*)'|([^ \\t\\r\\n\"'>/]+))"
NAME_ATTR_RE = "name" + _WS + "=" + _WS + _ATTR_VAL
CONTENT_ATTR_RE = "content" + _WS + "=" + _WS + _ATTR_VAL

# directive-list token separator — comma/whitespace including \r\n
# (quoted directive lists may wrap); shared with the oracle generator
TOKEN_SPLIT_RE = "[ \\t\\r\\n,]+"


def _attr_val(tag: Column, attr_re: str) -> Column:
    """Value of the (leftmost) attribute matched by attr_re in one
    tag — exactly one of the three alternation groups participates,
    the others extract ''."""
    return F.concat_ws(
        "",
        F.regexp_extract(tag, attr_re, 1),
        F.regexp_extract(tag, attr_re, 2),
        F.regexp_extract(tag, attr_re, 3),
    )


def robots_directives_col(html: Column) -> Column:
    """Comma-joined, lower-cased content values of ALL robots meta
    tags ('' when the page has none).

    Guarded: the lower() + regexp_extract_all + per-tag attribute
    extraction chain only runs on pages whose html can possibly carry
    a robots tag — `(?i)robots` over the raw string. The guard is
    EXACT, not heuristic: a nonempty result requires some tag's
    lowercased name value to equal ASCII "robots", i.e. lower(html)
    contains "robots", and the only codepoints whose Unicode simple
    lowercase contains any of r/o/b/t/s are the ASCII uppercase
    letters themselves (verified by exhaustive codepoint enumeration),
    which Java's ASCII-only `(?i)` covers precisely. The repo-wide
    `(?i)` ban is about SCRUB semantics (unicode case folding of
    match targets); here the flag implements an over-approximation
    test whose exactness is proved above. Pages without the substring
    skip the whole chain — on corpora where robots tags are rare this
    removes nearly the entire stage cost (one rlike scan remains)."""
    s = html.cast("string")
    low = F.lower(s)
    tags = F.regexp_extract_all(low, F.lit(META_TAG_RE), 0)
    robots_tags = F.filter(tags, lambda t: _attr_val(t, NAME_ATTR_RE) == "robots")
    joined = F.array_join(
        F.transform(robots_tags, lambda t: _attr_val(t, CONTENT_ATTR_RE)), ","
    )
    return (
        F.when(s.isNull(), F.lit(None).cast("string"))
        .when(s.rlike("(?i)robots"), joined)
        .otherwise(F.lit(""))
    )


def _has_token(directives: Column, token: str) -> Column:
    """Token membership in the comma/whitespace-separated directive
    list — substring matching would let 'noindexfoo' match, token
    split does not."""
    toks = F.split(directives, TOKEN_SPLIT_RE)
    return F.array_contains(toks, token) | F.array_contains(toks, "none")


def robots_noindex_col(html: Column) -> Column:
    """True when ANY robots meta tag carries noindex (or none) — the
    pipeline-stage form (`cfg.respect_noindex`); NULL html is False."""
    return _has_token(
        robots_directives_col(F.coalesce(html, F.lit(""))), "noindex"
    )


def robots_meta(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, robots_directives, robots_noindex, robots_nofollow):
    combined directive string of all robots meta tags plus the two
    standard opt-out flags (`none` implies both; any tag's opt-out
    wins). NULL html yields '' / False / False — an absent page body
    carries no directive."""
    directives = robots_directives_col(F.coalesce(F.col(html_col), F.lit("")))
    return df.select(
        F.col(id_col),
        directives.alias("robots_directives"),
        _has_token(directives, "noindex").alias("robots_noindex"),
        _has_token(directives, "nofollow").alias("robots_nofollow"),
    )
