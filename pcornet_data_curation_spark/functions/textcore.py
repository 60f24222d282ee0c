"""Deterministic per-document text statistics and model-style scorers.

This module is PURE pandas/numpy — no Spark imports. It is called in
exactly two places:

1. inside a vectorized ``pandas_udf``/``mapInPandas`` on executors
   (pcornet_data_curation_spark.operators.score), and
2. directly by the pandas reference oracle
   (pcornet_data_curation_spark.oracle.pandas_ref).

Because both paths run this identical code on identical inputs, the
keep/drop labels and scores agree bit-for-bit — the engine analog of
the reference's rule-flag DATA steps being the single source of truth
(potential_code_errors.sas:320-344).

Everything here is a pure function of its inputs plus module-level
constant tables built deterministically at import time (no RNG, no
wall clock).
"""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# Tokenization / character classes.
# Explicit ASCII classes only: Java (Spark regexp_*) and Python `re`
# disagree on \s/\w/\d unicode semantics, so we never use them.
# ---------------------------------------------------------------------------

WS_RE = re.compile(r"[ \t\n\r\f\x0b]+")
LINE_RE = re.compile(r"\n")
ALPHA_RE = re.compile(r"[A-Za-z]")
BULLET_PREFIXES = ("-", "*", "•", "‣", "◦")
ELLIPSIS_SUFFIXES = ("...", "…")
TERMINAL_PUNCT = (".", "!", "?", '"', "'")

# Gopher-style English stop words (count-based rule) — fixed, ordered.
STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
_STOP_SET = frozenset(STOP_WORDS)

# C4-style blocklist phrases (lowercase substring match).
C4_BAD_PHRASES = ("lorem ipsum",)


def tokenize(text: str) -> list[str]:
    """Whitespace tokens (explicit ASCII whitespace class)."""
    if not text:
        return []
    return [t for t in WS_RE.split(text) if t]


# ---------------------------------------------------------------------------
# Language-ID: hash-free character-trigram cosine against fixed profiles.
# fastText-style in spirit (char n-gram features -> linear scorer), built
# from small embedded seed corpora so the artifact is deterministic and
# self-contained (fasttext native lib is absent in this environment).
# ---------------------------------------------------------------------------

_LANG_SEEDS: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog and then it runs away "
        "this is a sentence about the weather and the people who live in the "
        "city they have been working with their friends for many years and "
        "would like to know what will happen when the time comes for them to "
        "leave because there is nothing more important than being able to "
        "understand each other through language and shared experience of the "
        "world which we all inhabit together with our families and friends"
    ),
    "de": (
        "der schnelle braune fuchs springt ueber den faulen hund und dann "
        "laeuft er weg dies ist ein satz ueber das wetter und die menschen "
        "die in der stadt leben sie arbeiten seit vielen jahren mit ihren "
        "freunden zusammen und moechten wissen was passieren wird wenn die "
        "zeit gekommen ist zu gehen denn es gibt nichts wichtigeres als "
        "einander durch sprache und gemeinsame erfahrung der welt zu "
        "verstehen die wir alle zusammen mit unseren familien bewohnen"
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux et puis "
        "il s enfuit ceci est une phrase sur le temps et les gens qui vivent "
        "dans la ville ils travaillent avec leurs amis depuis de nombreuses "
        "annees et voudraient savoir ce qui se passera quand le moment sera "
        "venu de partir car il n y a rien de plus important que de pouvoir "
        "se comprendre par la langue et l experience partagee du monde que "
        "nous habitons tous ensemble avec nos familles et nos amis"
    ),
    "es": (
        "el rapido zorro marron salta sobre el perro perezoso y luego se "
        "escapa esta es una frase sobre el clima y la gente que vive en la "
        "ciudad han estado trabajando con sus amigos durante muchos anos y "
        "les gustaria saber que pasara cuando llegue el momento de irse "
        "porque no hay nada mas importante que poder entendernos a traves "
        "del lenguaje y la experiencia compartida del mundo que todos "
        "habitamos juntos con nuestras familias y nuestros amigos"
    ),
    "it": (
        "la veloce volpe marrone salta sopra il cane pigro e poi scappa via "
        "questa e una frase sul tempo e sulle persone che vivono nella citta "
        "lavorano con i loro amici da molti anni e vorrebbero sapere cosa "
        "accadra quando arrivera il momento di partire perche non c e "
        "niente di piu importante che potersi capire attraverso la lingua e "
        "l esperienza condivisa del mondo che tutti abitiamo insieme alle "
        "nostre famiglie e ai nostri amici"
    ),
    "pt": (
        "a rapida raposa marrom pula sobre o cachorro preguicoso e depois "
        "foge esta e uma frase sobre o tempo e as pessoas que vivem na "
        "cidade elas trabalham com seus amigos ha muitos anos e gostariam "
        "de saber o que acontecera quando chegar a hora de partir porque "
        "nao ha nada mais importante do que poder nos entender atraves da "
        "linguagem e da experiencia compartilhada do mundo que todos nos "
        "habitamos juntos com nossas familias e nossos amigos"
    ),
    "nl": (
        "de snelle bruine vos springt over de luie hond en rent dan weg dit "
        "is een zin over het weer en de mensen die in de stad wonen ze "
        "werken al vele jaren samen met hun vrienden en willen graag weten "
        "wat er zal gebeuren als de tijd gekomen is om te vertrekken want "
        "er is niets belangrijker dan elkaar te kunnen begrijpen door taal "
        "en gedeelde ervaring van de wereld die wij allemaal samen bewonen "
        "met onze gezinnen en onze vrienden"
    ),
}

_NONLETTER_RE = re.compile(r"[^a-z ]+")

# 27-symbol alphabet [a-z ] → trigram id space 27^3; byte → symbol LUT
# lets the whole count run in numpy (frombuffer + bincount) instead of
# a per-character Python loop — the former doc_stats hot spot.
_TRI_DIM = 27**3
_TRI_LUT = np.full(256, 26, dtype=np.int64)  # 26 = space bucket
for _i, _ch in enumerate("abcdefghijklmnopqrstuvwxyz"):
    _TRI_LUT[ord(_ch)] = _i


def _trigram_vector(text: str) -> np.ndarray | None:
    """Dense 27^3 trigram count vector of the normalized text (None if
    too short to hold one trigram). After _NONLETTER_RE the string is
    pure ASCII [a-z ], so byte == character."""
    s = " " + _NONLETTER_RE.sub(" ", text.lower()) + " "
    s = WS_RE.sub(" ", s)
    if len(s) < 3:
        return None
    ids = _TRI_LUT[np.frombuffer(s.encode("ascii"), dtype=np.uint8)]
    tri = (ids[:-2] * 27 + ids[1:-1]) * 27 + ids[2:]
    return np.bincount(tri, minlength=_TRI_DIM).astype(np.float64)


def _build_profiles() -> tuple[list[str], np.ndarray, np.ndarray]:
    """(languages, known-trigram mask, L2-normalized profile matrix) in
    the dense 27^3 space."""
    langs = sorted(_LANG_SEEDS)
    mat = np.zeros((len(langs), _TRI_DIM), dtype=np.float64)
    for i, lang in enumerate(langs):
        vec = _trigram_vector(_LANG_SEEDS[lang])
        assert vec is not None
        norm = math.sqrt(float((vec**2).sum()))
        mat[i] = vec / norm if norm > 0 else vec
    known = (mat.sum(axis=0) > 0).astype(np.float64)
    return langs, known, mat


LANGID_LANGS, _LANGID_KNOWN, _LANGID_MAT = _build_profiles()


def langid_scores(text: str) -> tuple[str, float]:
    """(predicted language, confidence in [0,1]).

    Confidence = top cosine softmax-normalized over languages; 'und'
    with confidence 0.0 when the doc has no known trigram. The doc
    vector is masked to seed-known trigrams before normalization (same
    cosine as the sparse-vocab formulation).
    """
    vec = _trigram_vector(text) if text else None
    if vec is None:
        return "und", 0.0
    vec *= _LANGID_KNOWN
    norm = math.sqrt(float((vec**2).sum()))
    if norm == 0.0:
        return "und", 0.0
    sims = _LANGID_MAT @ (vec / norm)
    i = int(np.argmax(sims))
    exp = np.exp(sims * 8.0)
    conf = float(exp[i] / exp.sum())
    return LANGID_LANGS[i], conf


_SENTINEL = 27  # out-of-alphabet id splitting docs in the packed array


# int8, not int64: symbol ids fit a byte, and the packed stream is the
# hot memory traffic of the whole scorer (an int64 LUT turns every text
# byte into 8 — measurably bandwidth-bound at 32 concurrent workers)
_PACK_LUT = np.full(256, 26, dtype=np.int8)  # 26 = space bucket
for _i, _ch in enumerate("abcdefghijklmnopqrstuvwxyz"):
    _PACK_LUT[ord(_ch)] = _i
_PACK_LUT[0xFF] = _SENTINEL  # doc separator: 0xFF never occurs in UTF-8


def langid_scores_batch(
    texts: list[str], lowered: list[str] | None = None
) -> tuple[list[str], np.ndarray]:
    """Batch langid, sparse: normalize the WHOLE batch as one byte
    array — per doc " "+lower+" " segments joined by 0xFF (a byte no
    valid UTF-8 string contains), every non-[a-z] byte mapped to the
    space bucket, space runs collapsed with one boolean mask — then
    run-length the (doc, tri) pairs and compute each doc's
    per-language numerator with ONE bincount per language (8 total)
    and its norm with one more; no dense 27³-wide rows, no per-doc
    regex. Exactly the trigram sequence of the former per-doc
    `_NONLETTER_RE` + `WS_RE` normalization (multi-byte chars become
    space RUNS that the collapse reduces to the single space the
    regexes produced; too-short docs simply yield no valid window):
    bit-identical to the PREVIOUS batch implementation, and equal to
    the per-doc langid_scores up to float-accumulation order (the
    single-doc path uses a dense matvec; last-ulp confidence
    differences only) — pinned by
    test_textcore.test_langid_batch_matches_single and the hypothesis
    sweep in test_properties."""
    n = len(texts)
    langs_out: list[str] = ["und"] * n
    conf_out = np.zeros(n, dtype=np.float64)
    if n == 0:
        return langs_out, conf_out
    # `lowered` (optional): the already-lowercased texts (str.lower is
    # what this function would apply), so a batch caller that lowered
    # the column once for other features doesn't lower every document
    # a second time here. Identical payload bytes by construction.
    low_iter = lowered if lowered is not None else (t.lower() if t else "" for t in texts)
    payload = b"\xff".join(
        b" " + t.encode("utf-8") + b" " for t in low_iter
    )
    sym = _PACK_LUT[np.frombuffer(payload, dtype=np.uint8)]
    # collapse runs of spaces (id 26): keep a space only when the
    # previous kept symbol differs — for space runs that means only
    # the first survives, which is what WS_RE.sub(" ") produced
    is_sp = sym == 26
    keep = np.empty(len(sym), dtype=bool)
    keep[0] = True
    keep[1:] = ~(is_sp[1:] & is_sp[:-1])
    packed = sym[keep]
    # cumsum of separators = doc index at every non-separator position
    # (int64 accumulator — doc counts exceed int8)
    docs = np.cumsum(packed == _SENTINEL, dtype=np.int64)
    a, b, c = packed[:-2], packed[1:-1], packed[2:]
    valid = (a != _SENTINEL) & (b != _SENTINEL) & (c != _SENTINEL)
    if not valid.any():
        return langs_out, conf_out
    # int32 trigram ids (max 27^3-1 = 19682): same VALUES as the old
    # int64 math, a quarter of the traffic
    tri = (
        a[valid].astype(np.int32) * 27 + b[valid].astype(np.int32)
    ) * 27 + c[valid].astype(np.int32)
    dbin = docs[:-2][valid]
    # run-length encode (doc, tri) occurrences → per-doc sparse counts.
    # Hash-count + sort over the UNIQUE keys: same (sorted keys, counts)
    # pair np.unique returns, without sorting all occurrences.
    vc = pd.Series(dbin * _TRI_DIM + tri).value_counts(sort=False)
    ukeys = vc.index.to_numpy()
    order = np.argsort(ukeys, kind="stable")
    keys = ukeys[order]
    cnt = vc.to_numpy()[order]
    kdoc = keys // _TRI_DIM
    ktri = keys % _TRI_DIM
    cnt = cnt.astype(np.float64) * _LANGID_KNOWN[ktri]  # mask unknown tris
    norms = np.sqrt(np.bincount(kdoc, weights=cnt * cnt, minlength=n))
    num = np.empty((len(LANGID_LANGS), n), dtype=np.float64)
    for li in range(len(LANGID_LANGS)):
        num[li] = np.bincount(kdoc, weights=cnt * _LANGID_MAT[li, ktri], minlength=n)
    ok = norms > 0
    if not ok.any():
        return langs_out, conf_out
    sims = (num[:, ok] / norms[ok][None, :]).T  # (docs_ok, langs)
    best = np.argmax(sims, axis=1)
    exp = np.exp(sims * 8.0)
    confs = exp[np.arange(len(best)), best] / exp.sum(axis=1)
    for j, d in enumerate(np.nonzero(ok)[0]):
        langs_out[int(d)] = LANGID_LANGS[int(best[j])]
        conf_out[int(d)] = float(confs[j])
    return langs_out, conf_out


# ---------------------------------------------------------------------------
# Perplexity: character-bigram LM over [a-z ] with add-one smoothing,
# trained at import time on the embedded English seed corpus
# (KenLM-style n-gram scoring recast as a deterministic numpy table).
# ---------------------------------------------------------------------------

_PPL_ALPHABET = "abcdefghijklmnopqrstuvwxyz "
_PPL_INDEX = {c: i for i, c in enumerate(_PPL_ALPHABET)}
# byte → alphabet index (-1 = out of alphabet). Operating on UTF-8
# bytes instead of characters is EXACTLY pair-equivalent, including for
# non-ASCII text: (1) the alphabet is pure ASCII and UTF-8 multi-byte
# sequences use only bytes ≥ 0x80, so no continuation byte can alias an
# in-alphabet character; (2) two alphabet chars are string-adjacent iff
# their bytes are adjacent; (3) a multi-byte char only adds extra
# INVALID pairs, and invalid pairs are masked out BEFORE lp.mean(), so
# they never enter the average or shift the OOV share. Pinned by
# test_textcore.test_perplexity_byte_vs_char_indexing.
_PPL_LUT = np.full(256, -1, dtype=np.int64)
for _i, _ch in enumerate(_PPL_ALPHABET):
    _PPL_LUT[ord(_ch)] = _i


def _build_bigram_logprobs() -> np.ndarray:
    k = len(_PPL_ALPHABET)
    counts = np.ones((k, k), dtype=np.float64)  # add-one smoothing
    corpus = WS_RE.sub(" ", _NONLETTER_RE.sub(" ", (_LANG_SEEDS["en"] * 3).lower()))
    for a, b in zip(corpus, corpus[1:]):
        counts[_PPL_INDEX[a], _PPL_INDEX[b]] += 1.0
    return np.log(counts / counts.sum(axis=1, keepdims=True))


_PPL_LOGPROB = _build_bigram_logprobs()
_PPL_OOV_LOGPROB = float(np.log(1.0 / (len(_PPL_ALPHABET) ** 2)))


def perplexity(text: str, lowered: str | None = None) -> float:
    """Char-bigram perplexity vs the English LM; high = non-English/junk.

    Pairs containing out-of-alphabet characters (digits, punctuation,
    accented letters) are skipped, not penalized — symbol junk is the
    job of the symbol/alpha heuristics; ppl discriminates *language*.
    A doc with fewer than 10 in-alphabet pairs gets the max (OOV)
    perplexity — there is no language signal to score.

    `lowered` (optional): the precomputed ``text.lower()`` so a batch
    caller that already lowered the column doesn't lower each document
    again — identical values by construction.
    """
    if not text:
        return float(math.exp(-_PPL_OOV_LOGPROB))
    s = WS_RE.sub(" ", lowered if lowered is not None else text.lower())
    idx = _PPL_LUT[np.frombuffer(s.encode("utf-8"), dtype=np.uint8)]
    if len(idx) < 2:
        return float(math.exp(-_PPL_OOV_LOGPROB))
    a, b = idx[:-1], idx[1:]
    valid = (a >= 0) & (b >= 0)
    if int(valid.sum()) < 10:
        return float(math.exp(-_PPL_OOV_LOGPROB))
    lp = _PPL_LOGPROB[a[valid], b[valid]]
    return float(math.exp(-float(lp.mean())))


_PPL_OOV = float(math.exp(-_PPL_OOV_LOGPROB))


# ---------------------------------------------------------------------------
# Repetition (Gopher-style duplicate n-gram signals).
# ---------------------------------------------------------------------------


def dup_line_frac(text: str, lines: list[str] | None = None) -> float:
    """Fraction of characters inside lines that occur more than once.

    `lines` (optional): the precomputed non-blank line list — exactly
    `[ln for ln in text.split("\\n") if ln.strip()]` — so a batch
    caller that already split the text doesn't split it twice. Values
    are identical by construction."""
    if not text:
        return 0.0
    if lines is None:
        lines = [ln for ln in text.split("\n") if ln.strip()]
    if not lines:
        return 0.0
    seen: dict[str, int] = {}
    for ln in lines:
        seen[ln] = seen.get(ln, 0) + 1
    total = sum(len(ln) for ln in lines)
    dup = sum(len(ln) * n for ln, n in seen.items() if n > 1)
    return dup / total if total else 0.0


def _gram_windows(tokens: list[str], n: int) -> list[tuple[str, ...]]:
    """All n-gram tuples in order — C-speed zip, no per-i slicing."""
    return list(zip(*(tokens[i:] for i in range(n))))


def dup_ngram_char_frac(
    tokens: list[str], n: int, total: int | None = None
) -> float:
    """Fraction of characters covered by word n-grams that appear >1 time.

    `total` (optional): the precomputed `sum(map(len, tokens))`, so a
    batch caller that already summed token lengths doesn't sum them
    again. Identical values by construction."""
    if len(tokens) < n:
        return 0.0
    windows = _gram_windows(tokens, n)
    grams = Counter(windows)
    covered = np.zeros(len(tokens), dtype=bool)
    for i, g in enumerate(windows):
        if grams[g] > 1:
            covered[i : i + n] = True
    if total is None:
        total = sum(map(len, tokens))
    dup = sum(len(t) for t, c in zip(tokens, covered) if c)
    return dup / total if total else 0.0


def top_ngram_char_frac(
    tokens: list[str], n: int, total: int | None = None
) -> float:
    """Fraction of characters covered by the single most frequent n-gram.

    `total` (optional): precomputed `sum(map(len, tokens))` (see
    dup_ngram_char_frac)."""
    if len(tokens) < n:
        return 0.0
    grams = Counter(_gram_windows(tokens, n))
    top = max(grams, key=lambda g: (grams[g], g))
    if grams[top] <= 1:
        return 0.0
    if total is None:
        total = sum(map(len, tokens))
    return grams[top] * sum(map(len, top)) / total if total else 0.0


# ---------------------------------------------------------------------------
# The full per-document stat vector (one batch pass).
# ---------------------------------------------------------------------------

# (name, numpy dtype) — order is the struct field order everywhere.
STAT_FIELDS: list[tuple[str, str]] = [
    ("n_chars", "int64"),
    ("n_tokens", "int64"),
    ("n_lines", "int64"),
    ("n_sentences", "int64"),
    ("mean_word_len", "float64"),
    ("alpha_word_frac", "float64"),
    ("symbol_word_ratio", "float64"),
    ("bullet_line_frac", "float64"),
    ("ellipsis_line_frac", "float64"),
    ("stopword_count", "int64"),
    ("dup_line_frac", "float64"),
    ("dup_5gram_char_frac", "float64"),
    ("top_2gram_char_frac", "float64"),
    ("has_bad_phrase", "int64"),
    ("has_curly_brace", "int64"),
    ("lang_pred", "object"),
    ("lang_conf", "float64"),
    ("ppl", "float64"),
]


def doc_stats_frame(texts: pd.Series) -> pd.DataFrame:
    """Compute the full stat vector for a batch of documents.

    Input: pandas Series of str (None/NaN allowed → treated as '').
    Output: DataFrame with STAT_FIELDS columns, aligned to input index.

    Character-level stats run as batch pandas str ops (C speed, same
    counting semantics as the former per-doc str.count calls: regex
    matches are non-overlapping exactly like str.count); only the
    token/line/model stats loop per document.
    """
    vals = texts.fillna("").astype(str)
    low_all = vals.str.lower()
    n_chars = vals.str.len().to_numpy()
    sentences = (
        vals.str.count(r"\.") + vals.str.count("!") + vals.str.count(r"\?")
    ).to_numpy()
    symbols = (
        vals.str.count("#") + vals.str.count(r"\.\.\.") + vals.str.count("…")
    ).to_numpy()
    has_curly = (
        vals.str.contains("{", regex=False) | vals.str.contains("}", regex=False)
    ).to_numpy()
    has_bad = np.zeros(len(vals), dtype=bool)
    for p in C4_BAD_PHRASES:
        has_bad |= low_all.str.contains(p, regex=False).to_numpy()

    text_list = vals.tolist()
    low_list = low_all.tolist()
    lang_pred, lang_conf = langid_scores_batch(text_list, lowered=low_list)
    ppl = np.fromiter(
        (perplexity(t, lowered=lo) for t, lo in zip(text_list, low_list)),
        dtype=np.float64,
        count=len(text_list),
    )

    # The loop below is the measured-fastest formulation: a flattened-
    # token pandas .str pass and a per-doc numpy n-gram rewrite were
    # both built, verified bit-identical, and REJECTED by interleaved
    # in-process A/B (0.94× and 0.73× — pandas .str ops on object
    # dtype are Python-level loops with Series overhead, and per-doc
    # numpy machinery costs more than Counter on ~100-token docs).
    # What stays is the real duplicate-work removal: the lowercased
    # column is computed once and shared (langid, ppl, bad-phrase),
    # the non-blank line list is split once and shared (bullets/
    # ellipsis/dup_line_frac), and the token char total is summed once
    # and shared (mean_word_len, dup/top gram denominators). Measured
    # 1.21× on the whole core, bit-identical outputs.
    out: dict[str, list] = {
        name: []
        for name, _ in STAT_FIELDS
        if name
        not in (
            "n_chars",
            "n_sentences",
            "symbol_word_ratio",
            "has_bad_phrase",
            "has_curly_brace",
            "lang_pred",
            "lang_conf",
            "ppl",
        )
    }
    for text in text_list:
        tokens = tokenize(text)
        n_tokens = len(tokens)
        lines = [ln for ln in text.split("\n") if ln.strip()]
        stripped = [ln.strip() for ln in lines]
        n_lines = len(lines)
        tok_chars = sum(map(len, tokens))
        alpha_words = sum(1 for t in tokens if ALPHA_RE.search(t))
        bullets = sum(1 for ln in stripped if ln.startswith(BULLET_PREFIXES))
        ellipses = sum(1 for ln in stripped if ln.endswith(ELLIPSIS_SUFFIXES))
        stop_n = sum(1 for t in tokens if t.lower() in _STOP_SET)
        out["n_tokens"].append(n_tokens)
        out["n_lines"].append(n_lines)
        out["mean_word_len"].append(tok_chars / n_tokens if n_tokens else 0.0)
        out["alpha_word_frac"].append(alpha_words / n_tokens if n_tokens else 0.0)
        out["bullet_line_frac"].append(bullets / n_lines if n_lines else 0.0)
        out["ellipsis_line_frac"].append(ellipses / n_lines if n_lines else 0.0)
        out["stopword_count"].append(stop_n)
        out["dup_line_frac"].append(dup_line_frac(text, lines=lines))
        out["dup_5gram_char_frac"].append(
            dup_ngram_char_frac(tokens, 5, total=tok_chars)
        )
        out["top_2gram_char_frac"].append(
            top_ngram_char_frac(tokens, 2, total=tok_chars)
        )

    n_tok_arr = np.asarray(out["n_tokens"], dtype=np.float64)
    frame = pd.DataFrame(out, index=vals.index)
    frame["lang_pred"] = lang_pred
    frame["lang_conf"] = lang_conf
    frame["ppl"] = ppl
    frame["n_chars"] = n_chars
    frame["n_sentences"] = sentences
    frame["symbol_word_ratio"] = np.where(n_tok_arr > 0, symbols / np.maximum(n_tok_arr, 1), 0.0)
    frame["has_bad_phrase"] = has_bad.astype("int64")
    frame["has_curly_brace"] = has_curly.astype("int64")
    frame = frame[[name for name, _ in STAT_FIELDS]]
    for name, dtype in STAT_FIELDS:
        if dtype != "object":
            frame[name] = frame[name].astype(dtype)
    return frame
