"""URL-level filtering — the RefinedWeb/C4-style curation stage that
rejects pages by their URL before any text is read.

Reference analog: the valueset membership checks (broadcast lookup →
per-record flag, potential_code_errors.sas valueset joins) — here the
"valueset" is a domain blocklist and the per-record predicates are URL
heuristics. This is a first-class webtext-pipeline operator (every
production crawl filter starts with it: it is the only rule family
that can drop a page without decoding its payload, so at 10^12 docs
it runs FIRST, against the url column only, with the whole text/html
payload column-pruned away).

Scale design:
* Host parsing reuses reports.host_col (three non-backtracking steps;
  userinfo/port/IPv6 handled; unparsable → NULL).
* Blocklist matching must honor SUBDOMAINS (a blocklist entry
  `spam.example` must block `a.b.spam.example`). Naive LIKE-suffix
  matching is a non-equi join — quadratic against a 10^5-entry list.
  Instead each DISTINCT host explodes into its ≤ ~10 dot-suffixes and
  equi-joins the broadcast blocklist; the resulting blocked-host set
  (bounded by the distinct-host count) joins back onto the corpus as
  a plain host equi-join whose strategy AQE picks from its RUNTIME
  size — broadcast when actually small, shuffle when a wildcard
  domain blew it up. Hot hosts collapse map-side in the distinct.
* Every heuristic flag is JVM Column algebra over the url string —
  no UDF, no shuffle beyond the host distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcornet_data_curation_spark.operators.reports import AUTHORITY_RE, host_col

# demo keyword list (parameterized; production lists are larger and
# curated — the operator takes any tuple)
URL_KEYWORDS: tuple[str, ...] = ("casino", "viagra", "lottery", "xxx")


def blocked_hosts(hosts: DataFrame, blocklist: DataFrame) -> DataFrame:
    """(host) rows of `hosts` blocked by `blocklist(domain)` — exact
    host match or any dot-suffix match (subdomains). hosts must be
    distinct; the suffix explode is bounded by the label count."""
    labels = F.split(F.col("host"), "\\.")
    n = F.size(labels)
    sufx = F.transform(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )
    exploded = hosts.where(F.col("host").isNotNull()).select(
        "host", F.explode(sufx).alias("_sfx")
    )
    bl = F.broadcast(blocklist.select(F.lower(F.col("domain")).alias("_sfx")).distinct())
    return exploded.join(bl, "_sfx").select("host").distinct()


def url_filter(
    df: DataFrame,
    blocklist: DataFrame | None = None,
    url_col: str = "url",
    keywords: tuple[str, ...] = URL_KEYWORDS,
    max_url_len: int = 2048,
    max_query_params: int = 8,
    persist_blocked: bool = False,
) -> DataFrame:
    """Append URL-rule flags + `url_keep` to `df`.

    Flags (each two-valued, never NULL — same contract as the rule
    registry):
    * host           — parsed lowercased host (NULL when unparsable;
      a bracketed IPv6 literal also parses to NULL host — by design,
      the ip_host flag covers it, see below)
    * blocked_host   — host or any parent domain in `blocklist(domain)`
    * url_keyword    — any of `keywords` in the lowercased url
    * ip_host        — host is a bare IPv4-shaped literal, OR the
      authority is a bracketed IPv6/IPvFuture-style literal
      (`https://[2606:2800::1946]/…` — hex/colon/dot content)
    * non_ascii_host — host parsed but contains non-ASCII (an IDN that
      was NOT punycoded upstream). Informational, NOT folded into
      url_keep: an ASCII blocklist cannot match a raw-unicode host, so
      the documented policy is that production corpora punycode urls
      upstream (IDNA requires a codec — per-row Python — which this
      JVM-only operator deliberately avoids); this flag is the audit
      trail for rows where that contract was violated.
    * url_too_long   — len(url) > max_url_len
    * url_too_many_params — more than max_query_params '&'-separated
      query params in the QUERY string ('?a=1&b=2' is 2; '&' in the
      path or fragment is legal and not counted)
    * url_keep       — none of the dropping flags fired and the url
      parsed (ipv6 literals fail host-parse AND flag ip_host)

    The blocked-host join strategy is left to AQE's runtime size
    decision (the set's cardinality is corpus-driven — a blocklisted
    wildcard domain serving millions of random subdomains materializes
    one row each — so neither a forced broadcast nor an eager driver
    count() is safe/lazy; AQE converts to broadcast when the built set
    is actually small). persist_blocked=True additionally persists the
    set for callers that run MULTIPLE actions over the result (the
    pipeline: curate write + summary agg) — attached as
    ``result._persisted_deps`` for caller-controlled release; the
    default stays fully lazy with nothing cached.
    """
    url = F.col(url_col)
    host = host_col(url)
    out = df.withColumn("host", host)
    deps: list[DataFrame] = []
    if blocklist is not None:
        hosts = out.select("host").distinct()
        blocked = blocked_hosts(hosts, blocklist).withColumn("_blk", F.lit(True))
        if persist_blocked:
            blocked = blocked.persist()
            deps.append(blocked)
        out = out.join(blocked, "host", "left").withColumn(
            "blocked_host", F.coalesce(F.col("_blk"), F.lit(False))
        ).drop("_blk")
    else:
        out = out.withColumn("blocked_host", F.lit(False))
    kw = F.lit(False)
    live = [k for k in keywords if k]
    if live:
        # literal substring semantics: \Q..\E-quote each keyword so
        # regex metacharacters (or an empty string) can't turn the
        # alternation into match-everything / a pattern error
        kw = F.lower(url).rlike("|".join("\\Q" + k + "\\E" for k in live))
    # query string = after the first '?' that precedes any '#' — a '?'
    # inside the fragment is fragment text, not a query (RFC 3986)
    query = F.regexp_extract(url, "^[^#]*?\\?([^#]*)", 1)
    amp_n = F.length(query) - F.length(F.regexp_replace(query, "&", ""))
    params_n = F.when(F.length(query) > 0, amp_n + 1).otherwise(F.lit(0))
    # bracketed IPv6/IPvFuture literal: host_col returns NULL for it
    # (rejected at the '[' — see reports.host_col), so detect it on
    # the userinfo-stripped authority directly
    after_user = F.regexp_replace(
        F.regexp_extract(url, AUTHORITY_RE, 1), "^[^@]*@", ""
    )
    ipv6 = after_user.rlike("^\\[[0-9a-fA-F:.]+\\]")
    out = (
        out.withColumn("url_keyword", F.coalesce(kw, F.lit(False)))
        .withColumn(
            "ip_host",
            F.coalesce(F.col("host").rlike("^[0-9]+(\\.[0-9]+){3}$"), F.lit(False))
            | F.coalesce(ipv6, F.lit(False)),
        )
        .withColumn(
            "non_ascii_host",
            F.coalesce(F.col("host").rlike("[^\\x00-\\x7F]"), F.lit(False)),
        )
        .withColumn("url_too_long", F.coalesce(F.length(url) > max_url_len, F.lit(False)))
        .withColumn("url_too_many_params", params_n > max_query_params)
    )
    out = out.withColumn(
        "url_keep",
        F.col("host").isNotNull()
        & ~F.col("blocked_host")
        & ~F.col("url_keyword")
        & ~F.col("ip_host")
        & ~F.col("url_too_long")
        & ~F.col("url_too_many_params"),
    )
    out._persisted_deps = deps  # caller-controlled unpersist (see dedup)
    return out
