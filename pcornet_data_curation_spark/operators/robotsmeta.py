"""Robots meta-directive detection — surface `<meta name="robots">`
noindex/nofollow directives from raw page html so the pipeline can
respect publisher opt-outs at curation time (crawlers honor these at
fetch time; a curation engine re-processing stored WARCs must re-check
them itself — the C4/CCNet-class politeness stage).

Parsing contract (deliberately regex-shallow, like the extraction
chain): the FIRST `<meta ... name=robots ...>` tag wins, attribute
order free (name-then-content and content-then-name both match),
quoting optional, ASCII-lowercased before matching (explicit lower(),
never (?i) — the repo's Java-vs-RE2 unicode-case gotcha). Directives
are comma/space-separated tokens per the robots-meta convention;
matching is on the token list of the FIRST robots tag only, the rule
real crawlers apply. A `none` directive means noindex+nofollow.

Scale shape: three regexp_extracts + substring predicates over one
column — map-only, zero exchanges, whole-stage codegen, streaming-
safe. html may be binary (WARC payload) or string; binary is decoded
as UTF-8 by the cast.

Reference analog: the per-record valid-flag derivations feeding the
rule engine (potential_code_errors.sas:310-344) — a surface predicate
computed once at scan and carried as an auditable flag.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# explicit whitespace class (no \s), single-line matching only
_WS = "[ \\t\\r\\n]*"

# first <meta ...> tag whose name attribute is robots; group 1 = the
# full tag body, from which content= is then extracted. Two passes
# keep attribute order free without a combinatorial pattern.
ROBOTS_TAG_RE = (
    "(<meta[^>]*name" + _WS + "=" + _WS + "[\"']?robots[\"']?[^>]*>)"
)
CONTENT_ATTR_RE = (
    "content" + _WS + "=" + _WS + "(?:\"([^\"]*)\"|'([^']*)'|([^ \\t\"'>]+))"
)


def robots_directives_col(html: Column) -> Column:
    """Lower-cased content attribute of the first robots meta tag
    ('' when no robots tag or no content attribute)."""
    low = F.lower(html.cast("string"))
    tag = F.regexp_extract(low, ROBOTS_TAG_RE, 1)
    return F.concat_ws(
        "",
        F.regexp_extract(tag, CONTENT_ATTR_RE, 1),
        F.regexp_extract(tag, CONTENT_ATTR_RE, 2),
        F.regexp_extract(tag, CONTENT_ATTR_RE, 3),
    )


# directive-list token separator (comma/space per the robots-meta
# convention); shared with the oracle generator
TOKEN_SPLIT_RE = "[ \\t,]+"


def _has_token(directives: Column, token: str) -> Column:
    """Token membership in the comma/space-separated directive list —
    substring matching would let 'noindexfoo' match, token split does
    not."""
    toks = F.split(directives, TOKEN_SPLIT_RE)
    return F.array_contains(toks, token) | F.array_contains(toks, "none")


def robots_noindex_col(html: Column) -> Column:
    """True when the page's first robots meta tag carries noindex (or
    none) — the pipeline-stage form (`cfg.respect_noindex`); NULL html
    is False."""
    return _has_token(
        robots_directives_col(F.coalesce(html, F.lit(""))), "noindex"
    )


def robots_meta(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, robots_directives, robots_noindex, robots_nofollow):
    directive string of the first robots meta tag plus the two
    standard opt-out flags (`none` implies both). NULL html yields
    '' / False / False — an absent page body carries no directive."""
    directives = robots_directives_col(F.coalesce(F.col(html_col), F.lit("")))
    return df.select(
        F.col(id_col),
        directives.alias("robots_directives"),
        _has_token(directives, "noindex").alias("robots_noindex"),
        _has_token(directives, "nofollow").alias("robots_nofollow"),
    )
