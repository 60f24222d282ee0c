"""Property-based tests (hypothesis) over the pure-pandas core — no
Spark session, so these are fast and run wide input spaces: arbitrary
unicode must never crash the scorers, and every fraction/stat must stay
in its domain."""

import math

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from pcornet_data_curation_spark.functions.scrub import scrub_text_py
from pcornet_data_curation_spark.functions.textcore import (
    doc_stats_frame,
    langid_scores,
    perplexity,
    tokenize,
)

text_strategy = st.text(max_size=400)


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_doc_stats_domains(text):
    row = doc_stats_frame(pd.Series([text])).iloc[0]
    assert row["n_chars"] == len(text)
    assert row["n_tokens"] == len(tokenize(text))
    for frac in (
        "alpha_word_frac",
        "bullet_line_frac",
        "ellipsis_line_frac",
        "dup_line_frac",
        "dup_5gram_char_frac",
        "top_2gram_char_frac",
    ):
        assert 0.0 <= row[frac] <= 1.0, frac
    assert row["mean_word_len"] >= 0.0
    assert row["symbol_word_ratio"] >= 0.0
    assert row["stopword_count"] >= 0
    assert row["lang_conf"] >= 0.0 and row["lang_conf"] <= 1.0
    assert row["ppl"] > 0.0 and math.isfinite(row["ppl"])


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_batch_equals_per_doc_scorers(text):
    # the batch path used on executors must agree with the per-doc
    # functions for ANY input, not just the fixture
    row = doc_stats_frame(pd.Series([text])).iloc[0]
    lang, conf = langid_scores(text)
    assert row["lang_pred"] == lang
    assert abs(row["lang_conf"] - conf) < 1e-12
    assert abs(row["ppl"] - perplexity(text)) < 1e-9 * max(1.0, perplexity(text))


@settings(max_examples=300, deadline=None)
@given(text_strategy)
def test_scrub_idempotent_and_total(text):
    once = scrub_text_py(text)
    assert once is not None
    # scrubbing already-scrubbed text must not rewrite placeholders
    assert scrub_text_py(once) == once


@settings(max_examples=200, deadline=None)
@given(st.lists(text_strategy, max_size=20))
def test_doc_stats_batch_matches_singletons(texts):
    if not texts:
        return
    batch = doc_stats_frame(pd.Series(texts))
    for i, t in enumerate(texts):
        single = doc_stats_frame(pd.Series([t])).iloc[0]
        got = batch.iloc[i]
        assert got["lang_pred"] == single["lang_pred"]
        assert got["n_tokens"] == single["n_tokens"]
        assert abs(got["ppl"] - single["ppl"]) < 1e-9 * max(1.0, single["ppl"])


# ---- corpus-op properties (pure-python oracles, no Spark) -----------------

langid_batch_strategy = st.lists(st.text(max_size=120), min_size=0, max_size=12)


@settings(max_examples=120, deadline=None)
@given(langid_batch_strategy)
def test_langid_batch_agrees_with_single_for_any_unicode(texts):
    """The packed-byte batch langid must agree with the per-doc scorer
    (same language, confidence to accumulation noise) for ARBITRARY
    unicode — the byte-level space-collapse must reproduce the regex
    normalization everywhere, not just on the fixture."""
    from pcornet_data_curation_spark.functions.textcore import langid_scores_batch

    langs_b, confs_b = langid_scores_batch(texts)
    for i, t in enumerate(texts):
        lang_s, conf_s = langid_scores(t)
        assert langs_b[i] == lang_s, repr(t)
        assert abs(confs_b[i] - conf_s) < 1e-9, repr(t)


# ---- extraction roundtrip property (pure-python twin of the chain) --------

@settings(max_examples=300, deadline=None)
@given(st.text(max_size=300))
def test_extract_encode_roundtrip_any_unicode(text):
    """Encode-wrap-extract roundtrip for ARBITRARY unicode: a python-re
    twin of the exact extraction chain (same patterns, same order —
    the Java∩RE2∩Python dialect subset) must recover the original text
    modulo the whitespace collapse, for any content including raw
    entity strings (&amp;lt; must come back as the literal &lt;, never
    double-decoded) and non-ASCII whitespace at the edges."""
    import re

    from pcornet_data_curation_spark.operators import extract as EXC

    def py_extract(html: str) -> str:
        out = html
        for pat in (EXC._HEAD_RE, EXC._SCRIPT_RE, EXC._STYLE_RE,
                    EXC._COMMENT_RE, EXC._TAG_RE):
            out = re.sub(pat, " ", out)
        for ent, ch in EXC._ENTITIES:
            out = out.replace(ent, ch)
        return re.sub(EXC.WS, " ", out).strip()

    enc = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    page = (
        '<html><head><title>t</title><script>if (1<2 && 3>0) {}</script>'
        "</head><!-- c --><body><p>" + enc + "</p><i>footer &amp; nav</i></body></html>"
    )
    got = py_extract(page)
    want = re.sub(EXC.WS, " ", text + " footer & nav").strip()
    assert got == want, repr(text)


def _py_canonical_url(url: str) -> str:
    """Python twin of urlnorm.canonical_url_col built from the SAME
    spec constants ('$1' backref -> '\\1'); patterns are deliberately
    Java∩RE2∩Python-portable (explicit classes, no \\s \\d \\w)."""
    import re

    from pcornet_data_curation_spark.operators import urlnorm as UN

    m = re.search(UN._AUTH_SPLIT_RE, url)
    auth = m.group(1) if m and m.group(1) else ""
    rest = (m.group(2) or "") if m else ""
    if auth == "":
        return re.sub(UN.FRAGMENT_STEP[0], UN.FRAGMENT_STEP[1], url)
    a = auth.lower()
    for pat, rep in UN.AUTH_STEPS:
        a = re.sub(pat, rep.replace("$", "\\"), a)
    nf = re.sub(UN.FRAGMENT_STEP[0], UN.FRAGMENT_STEP[1], rest)
    pm = re.search(UN._REST_PATH_RE, nf)
    qm = re.search(UN._REST_QUERY_RE, nf)
    path = pm.group(1) if pm else ""
    q = (qm.group(1) or "") if qm else ""
    for pat, rep in UN.QUERY_STEPS:
        q = re.sub(pat, rep, q)
    r = path + q
    return a + (r if r != "" else "/")


_url_strategy = st.one_of(
    # url-shaped: scheme://host[:port]/path[?query][#frag] from a
    # deliberately nasty alphabet (&, ?, #, =, %, unicode, brackets)
    st.builds(
        lambda scheme, host, port, path, q, frag: (
            f"{scheme}://{host}{port}{path}{q}{frag}"
        ),
        st.sampled_from(["http", "HTTP", "https", "ftp"]),
        st.text(
            alphabet="aB9.-[]:é", min_size=1, max_size=12
        ).map(lambda s: s or "h"),
        st.sampled_from(["", ":80", ":443", ":8080"]),
        st.text(alphabet="/pq&=%.~é", max_size=15),
        st.one_of(
            st.just(""),
            st.text(alphabet="abc&=?_0", max_size=12).map(lambda s: "?" + s),
            st.just("?utm_source=x"),
            st.just("?utm_a=1&b=2&utm_b=3"),
        ),
        st.sampled_from(["", "#frag", "#a#b"]),
    ),
    # arbitrary garbage must stay total and idempotent too
    st.text(max_size=60),
)


@settings(max_examples=300, deadline=None)
@given(_url_strategy)
def test_canonical_url_idempotent_and_total(url):
    """Canonicalization must be IDEMPOTENT — canonical keys feed
    dedup, and a second normalization pass (re-crawl, re-run) must
    never move a url to a different group — and total (never raises,
    garbage maps to itself minus fragment)."""
    c1 = _py_canonical_url(url)
    c2 = _py_canonical_url(c1)
    assert c2 == c1, (url, c1, c2)
    assert "#" not in c1.split("://")[-1] or "://" not in c1


def _py_mojibake_fix(s: str) -> str:
    from pcornet_data_curation_spark.operators.mojibake import MOJIBAKE_STEPS

    for bad, good in MOJIBAKE_STEPS:
        s = s.replace(bad, good)
    return s


def _mojibake_safe_alphabet():
    """ASCII + repaired chars that never appear INSIDE a broken form.
    A char like 'Ã' is both repairable and part of other broken forms
    — a clean string containing literal 'Ã–' is indistinguishable
    from mojibake of 'Ö', and the fixed-table repairer (like any
    non-heuristic one) resolves the ambiguity toward repair. Found by
    this very property test; the roundtrip guarantee is scoped to the
    unambiguous alphabet."""
    from pcornet_data_curation_spark.operators.mojibake import (
        MOJIBAKE_STEPS,
        REPAIRED_CHARS,
    )

    broken_chars = set("".join(bad for bad, _ in MOJIBAKE_STEPS))
    safe = [c for c in REPAIRED_CHARS if c not in broken_chars]
    assert len(safe) > 40  # the ambiguous residue is a handful
    return list("abc DEF.!?'\"\n\t") + safe


@settings(max_examples=300, deadline=None)
@given(st.data())
def test_mojibake_roundtrip_over_unambiguous_alphabet(data):
    """For any string over ASCII + the unambiguously-repairable
    characters, fix(sloppy_cp1252(utf8(text))) == text — the repair
    chain exactly inverts the damage it claims to fix. (Strings
    containing chars that themselves occur inside broken forms — 'Ã',
    '€', … — are inherently ambiguous and deliberately out of scope:
    the operator resolves lookalikes toward repair.)"""
    from pcornet_data_curation_spark.operators.mojibake import _sloppy_cp1252

    text = data.draw(
        st.text(alphabet=st.sampled_from(_mojibake_safe_alphabet()), max_size=120)
    )
    broken = _sloppy_cp1252(text.encode("utf-8"))
    assert _py_mojibake_fix(broken) == text
