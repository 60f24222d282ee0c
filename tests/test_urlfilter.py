"""URL-level filtering (RefinedWeb/C4-style) — blocklist subdomain
semantics, heuristic flags, and the adversarial-url regression set
shared with the host parser."""

import pytest


@pytest.fixture(scope="module")
def flags(spark):
    from pcornet_data_curation_spark.operators.urlfilter import url_filter

    rows = [
        (1, "https://good.example.org/a"),
        (2, "https://spam.example.net/x"),                 # exact blocklist
        (3, "https://a.b.spam.example.net/x"),             # subdomain blocklist
        (4, "https://notspam.example.net/x"),              # suffix must NOT match
        (5, "https://alice@[::1]/p"),                      # ipv6+userinfo → NULL host
        (6, "https://bob@good.example.org:8080/p"),        # userinfo+port stripped
        (7, "https://WIN-casino.example.com/promo"),       # keyword (case-folded)
        (8, "https://93.184.216.34/raw"),                  # bare IPv4 host
        (9, "https://ok.example.org/q?a=1&b=2&c=3&d=4&e=5&f=6&g=7&h=8&i=9"),
        (10, "https://long.example.org/" + "x" * 3000),    # too long
        (11, None),                                        # NULL url
        (12, "not a url at all"),                          # unparsable
        (13, "https://[2606:2800:220:1:248:1893:25c8:1946]/v6"),  # bare ipv6
        (14, "https://bücher.example/idn"),                 # raw-unicode IDN
        (15, "https://xn--bcher-kva.example/idn"),          # punycoded (ascii)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    bl = spark.createDataFrame(
        [("spam.example.net",), ("blocked.example.org",)], "domain string"
    )
    out = url_filter(df, bl).toPandas().set_index("doc_id")
    return out


def test_blocklist_subdomain_semantics(flags):
    assert flags.loc[2, "blocked_host"] and not flags.loc[2, "url_keep"]
    assert flags.loc[3, "blocked_host"]          # deep subdomain blocked
    assert not flags.loc[4, "blocked_host"]      # 'notspam...' is NOT a subdomain
    assert flags.loc[4, "url_keep"]
    assert flags.loc[1, "url_keep"]


def test_heuristic_flags(flags):
    assert flags.loc[7, "url_keyword"] and not flags.loc[7, "url_keep"]
    assert flags.loc[8, "ip_host"] and not flags.loc[8, "url_keep"]
    assert flags.loc[9, "url_too_many_params"] and not flags.loc[9, "url_keep"]
    assert flags.loc[10, "url_too_long"] and not flags.loc[10, "url_keep"]
    # port+userinfo variants parse to the clean host and keep
    assert flags.loc[6, "host"] == "good.example.org" and flags.loc[6, "url_keep"]


def test_unparsable_never_keeps_and_flags_two_valued(flags):
    import pandas as pd

    for i in (5, 11, 12):
        assert pd.isna(flags.loc[i, "host"])
        assert not flags.loc[i, "url_keep"]
    # every flag column is two-valued (no NULL leaks through keep logic)
    for c in ("blocked_host", "url_keyword", "ip_host", "non_ascii_host",
              "url_too_long", "url_too_many_params", "url_keep"):
        assert flags[c].notna().all(), c


def test_ipv6_literal_and_idn_policy(flags):
    import pandas as pd

    # bracketed IPv6 literal: NULL host by design, but flagged ip_host
    # (an IP-literal drop, not an unexplained parse failure) + dropped
    assert pd.isna(flags.loc[13, "host"])
    assert flags.loc[13, "ip_host"] and not flags.loc[13, "url_keep"]
    # ipv6+userinfo variant gets the same treatment
    assert flags.loc[5, "ip_host"]
    # raw-unicode IDN: parses, KEEPS (policy: punycode upstream), but
    # carries the audit flag — an ASCII blocklist can't match it
    assert flags.loc[14, "host"] == "bücher.example"
    assert flags.loc[14, "non_ascii_host"] and flags.loc[14, "url_keep"]
    # punycoded form is plain ASCII: no flag, keeps
    assert flags.loc[15, "host"] == "xn--bcher-kva.example"
    assert not flags.loc[15, "non_ascii_host"] and flags.loc[15, "url_keep"]


def test_keyword_escaping_and_param_scoping(spark):
    """Keywords are literal substrings (regex metacharacters and empty
    strings are inert), and the query-param count only looks at the
    query string — '&' in a path is legal and never counted."""
    from pcornet_data_curation_spark.operators.urlfilter import url_filter

    rows = [
        (1, "https://ok.example.org/a&b&c&d&e&f&g&h&i&j/page"),   # & in PATH only
        (2, "https://ok.example.org/a&b&c&d&e&f&g&h&i?q=1"),       # path &s + 1 param
        (3, "https://cpp.example.org/about-c++"),                   # metachar keyword
        (4, "https://ok.example.org/x?a=1&b=2"),                    # 2 params
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = url_filter(
        df, keywords=("c++", "", "casino")
    ).toPandas().set_index("doc_id")
    assert not got.loc[1, "url_too_many_params"] and got.loc[1, "url_keep"]
    assert not got.loc[2, "url_too_many_params"]   # 1 real query param
    assert not got.loc[4, "url_too_many_params"]
    assert got.loc[3, "url_keyword"]               # literal 'c++' matched
    assert not got.loc[4, "url_keyword"]           # empty keyword is inert


def test_url_filter_without_blocklist(spark):
    from pcornet_data_curation_spark.operators.urlfilter import url_filter

    df = spark.createDataFrame(
        [(1, "https://fine.example.org/")], "doc_id long, url string"
    )
    got = url_filter(df).toPandas()
    assert not got["blocked_host"].iloc[0] and got["url_keep"].iloc[0]


def test_fragment_question_mark_is_not_a_query(spark):
    """RFC 3986: a '?' inside the fragment does not start a query —
    '&'s after it are fragment text, never counted as params."""
    from pcornet_data_curation_spark.operators.urlfilter import url_filter

    rows = [
        (1, "https://ok.example.org/p#frag?a=1&b=2&c=3&d=4&e=5&f=6&g=7&h=8&i=9"),
        (2, "https://ok.example.org/p?a=1&b=2&c=3&d=4&e=5&f=6&g=7&h=8&i=9#frag"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = url_filter(df).toPandas().set_index("doc_id")
    assert not got.loc[1, "url_too_many_params"] and got.loc[1, "url_keep"]
    assert got.loc[2, "url_too_many_params"]     # real 9-param query
