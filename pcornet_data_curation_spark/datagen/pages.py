"""Deterministic Common-Crawl-style `pages` generator.

Schema (BASELINE.json input_hint):
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Every row is a pure function of (seed, doc id) via a splitmix64 counter
hash — no RNG state — so the distributed Spark generation
(``pages_df``: spark.range → mapInPandas) and the local pandas
generation (``pages_pdf``) produce byte-identical rows. Fixture design
follows FIXTURES.md §1: skewed domain long-tail, dense multi-month
warc_ts with NULL/future/pre-1900 outliers, and a controlled mixture of
document archetypes so every rule fires.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

MASK64 = (1 << 64) - 1


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + 0x9E3779B97F4A7C15) & MASK64
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK64
    return z ^ (z >> 31)


def _rand01(ids: np.ndarray, stream: int, seed: int) -> np.ndarray:
    h = _splitmix64((ids.astype(np.uint64) * np.uint64(1000003) + np.uint64(stream * 7919 + seed)) & MASK64)
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


_EN_SENTS = [
    "The committee published the annual report on regional development and the members discussed it at length.",
    "Researchers at the university have been studying how rivers shape the valley over thousands of years.",
    "She walked to the market in the morning and bought fresh bread, cheese, and a basket of apples.",
    "The new library opened last week and hundreds of people came to see the reading rooms.",
    "Engineers tested the bridge for several months before it was opened to traffic.",
    "The orchestra performed a symphony that had not been heard in the city for decades.",
    "Farmers in the region expect a good harvest this year because the rain came at the right time.",
    "The museum's collection includes paintings, sculptures, and manuscripts from many countries.",
]

_DE_SENT = "Die Mitglieder des Ausschusses haben den Bericht über die Entwicklung der Region ausführlich besprochen und viele Fragen gestellt."
_FR_SENT = "Les membres du comité ont longuement discuté du rapport sur le développement de la région et posé beaucoup de questions."
_ES_SENT = "Los miembros del comité discutieron extensamente el informe sobre el desarrollo de la región y plantearon muchas preguntas."

_HOT_DOMAINS = ["big-portal.example.com", "mega-news.example.org", "hub.example.net"]
_ARCHETYPES = (
    ("clean_en", 0.50),
    ("short", 0.06),
    ("symbol_heavy", 0.05),
    ("repetitive", 0.06),
    ("bullet", 0.05),
    ("non_en", 0.10),
    ("pii", 0.06),
    ("toxic", 0.03),
    ("lorem", 0.02),
    ("empty", 0.02),
    ("null_text", 0.02),
    ("curly_code", 0.03),
)
_CUM = np.cumsum([w for _, w in _ARCHETYPES])


def _doc_text(kind: str, i: int) -> str | None:
    pick = lambda k: _EN_SENTS[(i * 31 + k * 7) % len(_EN_SENTS)]  # noqa: E731
    base = " ".join(pick(k) for k in range(4 + (i % 5)))
    if kind == "clean_en":
        return base
    if kind == "short":
        return "Tiny page " + str(i % 97) + "."
    if kind == "symbol_heavy":
        return ("### " + pick(0) + " ### ... ## ") * 6
    if kind == "repetitive":
        phrase = "click here to win amazing prizes now "
        return (phrase * 40) + pick(1)
    if kind == "bullet":
        items = "\n".join("- item " + str(j) + " in the endless list" for j in range(12))
        return items + "\n" + pick(2)
    if kind == "non_en":
        s = [_DE_SENT, _FR_SENT, _ES_SENT][i % 3]
        return " ".join([s] * (3 + i % 3))
    if kind == "pii":
        return (
            base
            + " Contact john.doe"
            + str(i % 50)
            + "@mail.example.com or call 415-555-"
            + str(1000 + i % 9000)
            + ". SSN 123-45-"
            + str(1000 + i % 9000)
            + " from host 192.168.1."
            + str(i % 250)
            + "."
        )
    if kind == "toxic":
        return base + " What the frak is this gorram nonsense, total smeg."
    if kind == "lorem":
        return "Lorem ipsum dolor sit amet, consectetur adipiscing elit. " * 8
    if kind == "empty":
        return ""
    if kind == "null_text":
        return None
    if kind == "curly_code":
        return "function f(x) { return x * 2; } // " + pick(3) + " { }"
    raise ValueError(kind)


def pages_pdf(n_rows: int, seed: int = 42, id_start: int = 0) -> pd.DataFrame:
    """Local/pandas generation for ids [id_start, id_start+n_rows)."""
    ids = np.arange(id_start, id_start + n_rows, dtype=np.int64)
    return _pages_for_ids(ids, seed)


def _pages_for_ids(ids: np.ndarray, seed: int) -> pd.DataFrame:
    r_arch = _rand01(ids, 1, seed)
    r_dom = _rand01(ids, 2, seed)
    r_ts = _rand01(ids, 3, seed)
    r_tsnull = _rand01(ids, 4, seed)
    r_langerr = _rand01(ids, 5, seed)
    r_html = _rand01(ids, 6, seed)

    kinds = [_ARCHETYPES[int(np.searchsorted(_CUM, r))][0] for r in np.clip(r_arch, 0, _CUM[-1] - 1e-12)]
    texts = [_doc_text(k, int(i)) for k, i in zip(kinds, ids)]

    # Skewed long-tail: 50% of rows land on 3 hot domains.
    domains = [
        _HOT_DOMAINS[int(i) % 3] if r < 0.5 else f"site-{int(i) % 4000:04d}.example.com"
        for i, r in zip(ids, r_dom)
    ]
    urls = [f"https://{d}/doc/{int(i)}" for d, i in zip(domains, ids)]

    # warc_ts: dense 2019-01..2024-12 range, 2% NULL, 1% future, 1% pre-1900.
    base = dt.datetime(2019, 1, 1)
    span = (dt.datetime(2025, 1, 1) - base).total_seconds()
    ts: list[dt.datetime | None] = []
    for r, rn in zip(r_ts, r_tsnull):
        if rn < 0.02:
            ts.append(None)
        elif rn < 0.03:
            ts.append(dt.datetime(2091, 6, 15, 12, 0, 0))
        elif rn < 0.04:
            ts.append(dt.datetime(1850, 3, 1, 0, 0, 0))
        else:
            ts.append(base + dt.timedelta(seconds=int(r * span)))

    langs: list[str | None] = []
    for k, r, i in zip(kinds, r_langerr, ids):
        actual = ["de", "fr", "es"][int(i) % 3] if k == "non_en" else "en"
        if r < 0.05:
            langs.append(None)
        elif r < 0.08:
            langs.append("UN")
        elif r < 0.13:
            langs.append("zh")  # declared wrong vs actual
        else:
            langs.append(actual)

    htmls: list[bytes | None] = []
    for t, r in zip(texts, r_html):
        if t is None:
            htmls.append(None)
        elif r < 0.05:  # extraction-mismatch rows
            htmls.append(b"<html><body>UNRELATED CONTENT</body></html>")
        else:
            htmls.append(b"<html><body>" + t.encode("utf-8") + b"</body></html>")

    return pd.DataFrame(
        {
            "url": pd.Series(urls, dtype="object"),
            "warc_ts": pd.Series(ts, dtype="datetime64[us]"),
            "html": pd.Series(htmls, dtype="object"),
            "text": pd.Series(texts, dtype="object"),
            "lang": pd.Series(langs, dtype="object"),
        }
    )


PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def pages_df(spark, n_rows: int, seed: int = 42, partitions: int = 8):
    """Distributed generation: spark.range → mapInPandas, same rows as
    ``pages_pdf`` (pure function of id). Scales to any n_rows without a
    driver-side materialization."""

    def gen(batches):
        for pdf in batches:
            yield _pages_for_ids(pdf["id"].to_numpy(dtype=np.int64), seed)

    return spark.range(0, n_rows, 1, partitions).mapInPandas(gen, PAGES_DDL)
