"""URL canonicalization + canonical-URL dedup — the crawl-side
companion of exact text dedup: the same page fetched as
`http://www.Example.com/a?utm_source=feed#top` and
`http://www.example.com/a` must collapse to ONE canonical key before
any content work is spent on it. Production crawls dedup by
canonical URL first because it is the cheapest dedup there is — no
payload read, no text normalization, one string pass.

Reference analog: the concatenated-key derivation + nodupkey dedup
pair (data_curation_base.sas) — derive a normalized key column, keep
the first record per key — lifted to URL semantics.

Canonicalization (deliberately conservative — only transforms that
never change which resource is addressed):
  - scheme and host lowercased (RFC 3986 §6.2.2.1 case normalization;
    path/query case is preserved — it is significant),
  - fragment stripped (never sent to the server),
  - default ports stripped (http://h:80/ = http://h/, https :443),
  - tracking query parameters removed (utm_*, fbclid, gclid,
    msclkid, ref_src — parameters that alter analytics, not content),
  - empty leftover query punctuation tidied ('?&', '&&', trailing
    '?'/'&'),
  - empty path after authority → '/' (RFC 3986 §6.2.3).

Everything is a short chain of non-backtracking regexp_replace steps
plus one structural split (authority lowercased, rest untouched), so
the identical chain runs in DuckDB and the registry entry is
value-hash-checked end-to-end. No UDF, no shuffle in the
canonicalizer itself; the dedup is ONE groupBy on the 8-byte hash of
the canonical url (partial agg absorbs hot urls map-side) + one
equi-join — the exact-dedup family's standard shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one (pattern, replacement) spec drives BOTH engines (the LINES_STEPS
# convention from operators/extract.py) — applied to the QUERY STRING
# ONLY ('?...', split from the path first): '&' is a legal PATH
# character (RFC 3986 pchar includes sub-delims), so a path-scoped
# replacement would strip '/p&utm_source=feed' down to '/p' and
# collapse two genuinely distinct resources onto one canonical key.
# Order is load-bearing.
_TRACKING = "(utm_[a-zA-Z0-9_]*|fbclid|gclid|msclkid|ref_src)"
QUERY_STEPS: tuple[tuple[str, str], ...] = (
    # 1. NON-LEADING tracking params take their '&' with them — after
    #    this pass at most one tracking param remains, right after '?'
    ("&" + _TRACKING + "=[^&]*", ""),
    # 2. leading tracking param followed by a real param: '&' -> '?'
    ("^\\?" + _TRACKING + "=[^&]*&", "?"),
    # 3. leading tracking param alone: the whole query goes
    ("^\\?" + _TRACKING + "=[^&]*$", ""),
    # 4. tidy a dangling tail ('?' / '?&' from an already-empty query)
    ("[?&]+$", ""),
)

# fragment strip (applied to the whole after-authority part BEFORE the
# path/query split — never sent to the server, RFC 3986 §3.5)
FRAGMENT_STEP: tuple[str, str] = ("#.*$", "")

# path/query split of the (fragment-stripped) after-authority part
_REST_PATH_RE = "^([^?]*)"
_REST_QUERY_RE = "^[^?]*(\\?.*)$"

# authority = scheme://host[:port] (host may be a bracketed IPv6
# literal); group 2 = everything after it (path?query#fragment)
_AUTH_SPLIT_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)([/?#].*)?$"

# default-port strip on the LOWERCASED authority
AUTH_STEPS: tuple[tuple[str, str], ...] = (
    ("^(http://[^/?#:]+|http://\\[[^\\]]*\\]):80$", "$1"),
    ("^(https://[^/?#:]+|https://\\[[^\\]]*\\]):443$", "$1"),
)


def canonical_url_col(url: Column) -> Column:
    """Canonical form of `url` (Column -> Column, pure JVM). A url
    that does not parse as scheme://authority... canonicalizes to
    itself with only the fragment stripped — garbage stays distinct
    rather than colliding."""
    auth = F.regexp_extract(url, _AUTH_SPLIT_RE, 1)
    rest = F.regexp_extract(url, _AUTH_SPLIT_RE, 2)
    a = F.lower(auth)
    for pat, rep in AUTH_STEPS:
        a = F.regexp_replace(a, pat, rep)
    nf = F.regexp_replace(rest, FRAGMENT_STEP[0], FRAGMENT_STEP[1])
    path = F.regexp_extract(nf, _REST_PATH_RE, 1)
    q = F.regexp_extract(nf, _REST_QUERY_RE, 1)
    for pat, rep in QUERY_STEPS:
        q = F.regexp_replace(q, pat, rep)
    r = F.concat(path, q)
    r = F.when(r == "", F.lit("/")).otherwise(r)
    return F.when(
        auth == "", F.regexp_replace(url, FRAGMENT_STEP[0], FRAGMENT_STEP[1])
    ).otherwise(F.concat(a, r))


def url_canonical_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, url, canonical_url, is_canonical_keeper): every row tagged
    with its canonical url and whether it is the keeper — the minimum
    id among rows sharing a canonical url (deterministic; with a
    timestamp column callers order on (ts, id) upstream instead).
    Keeper resolution is one groupBy on xxhash64(canonical_url) — hot
    urls collapse map-side — plus one AQE-routed equi-join; the
    canonical text itself never shuffles twice."""
    tagged = df.select(
        F.col(id_col).alias("_id"),
        F.col(url_col).alias("_url"),
        canonical_url_col(F.col(url_col)).alias("_curl"),
    ).withColumn("_ch", F.xxhash64("_curl"))
    keeper = tagged.groupBy("_ch").agg(F.min("_id").alias("_keep_id"))
    return (
        tagged.join(keeper, "_ch")
        .select(
            F.col("_id").alias(id_col),
            F.col("_url").alias(url_col),
            F.col("_curl").alias("canonical_url"),
            (F.col("_id") == F.col("_keep_id")).alias("is_canonical_keeper"),
        )
    )
