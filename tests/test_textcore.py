"""Unit tests for the deterministic scoring core (no Spark needed)."""

import pandas as pd
import pytest

from pcornet_data_curation_spark.functions import textcore as tc


def test_tokenize_ascii_whitespace_only():
    assert tc.tokenize("a b\tc\nd") == ["a", "b", "c", "d"]
    assert tc.tokenize("") == []
    # unicode nbsp is NOT a separator (explicit ASCII class)
    assert tc.tokenize("a\xa0b") == ["a\xa0b"]


def test_langid_basic():
    en, conf = tc.langid_scores("the committee published the annual report and the members discussed it")
    assert en == "en" and conf > 0.3
    de, _ = tc.langid_scores("der schnelle braune fuchs springt ueber den faulen hund und dann")
    assert de == "de"
    und, c0 = tc.langid_scores("")
    assert und == "und" and c0 == 0.0


def test_perplexity_ordering():
    # long samples — char-bigram ppl is noisy on single short sentences
    en = tc.perplexity(
        "she walked to the market in the morning and bought fresh bread and "
        "the new library opened last week and hundreds of people came to see "
        "the reading rooms and the orchestra performed for the people there"
    )
    de = tc.perplexity(
        "die mitglieder des ausschusses haben den bericht ueber die "
        "entwicklung der region ausfuehrlich besprochen und viele fragen "
        "gestellt und sie arbeiten seit vielen jahren mit ihren freunden"
    )
    junk = tc.perplexity("zqxj wvkq zzzz qqqq xjxj zqxj wvkq zzzz qqqq xjxj")
    assert en < de < junk
    assert tc.perplexity("") > 100  # OOV max for no signal
    assert tc.perplexity("12345 !!!") > 100  # <10 in-alphabet pairs


def test_dup_ngram_fracs():
    toks = ("click here to win now " * 10).split()
    assert tc.dup_ngram_char_frac(toks, 5) == 1.0
    assert tc.dup_ngram_char_frac(["a", "b", "c"], 5) == 0.0
    assert tc.top_ngram_char_frac(toks, 2) > 0.0
    assert tc.dup_line_frac("x\ny\nx") == pytest.approx(2 / 3)
    assert tc.dup_line_frac("") == 0.0


def test_doc_stats_frame_nulls_and_types():
    s = pd.Series(["the cat sat. it sat!", None, ""])
    f = tc.doc_stats_frame(s)
    assert list(f.columns) == [n for n, _ in tc.STAT_FIELDS]
    assert f.loc[0, "n_tokens"] == 5
    assert f.loc[0, "n_sentences"] == 2
    assert f.loc[1, "n_chars"] == 0 and f.loc[2, "n_chars"] == 0
    assert f["n_tokens"].dtype == "int64" and f["ppl"].dtype == "float64"


def test_determinism():
    s = pd.Series(["the quick brown fox jumps over the lazy dog"] * 3)
    f1, f2 = tc.doc_stats_frame(s), tc.doc_stats_frame(s)
    pd.testing.assert_frame_equal(f1, f2)
    assert f1.loc[0, "ppl"] == f1.loc[1, "ppl"]


def test_perplexity_byte_vs_char_indexing():
    """Byte-LUT perplexity must equal a per-character reference for
    non-ASCII input: continuation bytes (≥0x80) can't alias the ASCII
    alphabet and invalid pairs are masked before the mean, so the two
    views score identically (ppl feeds keep/drop thresholds — any
    definition drift here flips verdicts)."""
    import math

    import numpy as np

    from pcornet_data_curation_spark.functions import textcore as tc

    def ppl_char(text):
        if not text:
            return tc._PPL_OOV
        s = tc.WS_RE.sub(" ", text.lower())
        idx = np.array([tc._PPL_INDEX.get(c, -1) for c in s], dtype=np.int64)
        if len(idx) < 2:
            return tc._PPL_OOV
        a, b = idx[:-1], idx[1:]
        valid = (a >= 0) & (b >= 0)
        if int(valid.sum()) < 10:
            return tc._PPL_OOV
        return float(math.exp(-float(tc._PPL_LOGPROB[a[valid], b[valid]].mean())))

    cases = [
        "the quick brown fox jumps over the lazy dog and runs away fast",
        "héllo wörld, çafé über naïve résumé — the quick brown fox runs here",
        "русский текст совсем не английский но довольно длинный для оценки",
        "日本語のテキストですこれは英語ではありません",
        "mixed ascii and 中文 characters interleaved in one document for tests",
        "the qúick brown fôx jumps över the lazy dög and rúns away fast now",
        "é" * 50,
        "",
        "a" * 5,
    ]
    for t in cases:
        assert tc.perplexity(t) == ppl_char(t), t[:40]


def test_langid_batch_matches_single():
    """The packed-byte batch path must agree with the per-doc scorer:
    identical language picks, confidences equal to float-accumulation
    noise (the two paths sum dot products in different orders), on a
    unicode-adversarial corpus including the normalization edge cases
    the byte-level collapse must reproduce (multi-byte chars -> single
    space, mixed whitespace runs, K Kelvin lowering to ascii 'k',
    too-short docs, empty docs)."""
    import numpy as np

    texts = [
        "the committee published the annual report and the members discussed it",
        "der schnelle braune fuchs springt ueber den faulen hund und dann",
        "",
        " ",
        "a",
        "ab",
        "é" * 7,
        "Kelvin the and of the weather",   # KELVIN SIGN lowers to ascii k
        "\x00\t\n weird \x0b mixed\fwhitespace",
        "日本語テキスト",
        "café au lait et le croissant les amis",
        "a\t\tb  c\nd",
        "the the the",
        "ſtraße und der hund",          # long s + sharp s
    ]
    langs_b, confs_b = tc.langid_scores_batch(texts)
    for i, t in enumerate(texts):
        lang_s, conf_s = tc.langid_scores(t)
        assert langs_b[i] == lang_s, (i, t)
        assert confs_b[i] == pytest.approx(conf_s, rel=1e-9, abs=1e-12), (i, t)
    # deterministic across calls
    langs2, confs2 = tc.langid_scores_batch(texts)
    assert langs2 == langs_b and np.array_equal(confs2, confs_b)
