"""Byte-identity of the JVM regexp_replace scrub chain vs the Python
`re` oracle — including the adversarial unicode/boundary regression set
(BASELINE.json: byte-identical scrubbed text per url)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pcornet_data_curation_spark.functions.scrub import (
    scrub_column,
    scrub_series_py,
    scrub_text_py,
)

ADVERSARIAL = [
    "Email: a.b@x.co, ip 10.0.0.1. Call (415) 555-1234 now 999-88-7777",
    "ſmeg fraK FRAK frak Frak Kelvin smeg SMEG",  # unicode case-folding traps
    "v1.192.168.1.1.3 and 1.2.3.4.5 partial 300-12-3456x",
    "",
    "no pii here at all",
    "a@b.co a@b.co a@b.co",  # repeated matches
    "4111 1111 1111 1111 and 4111-1111-1111-1111",
    "+1 415.555.2671 or 415 555 2671",
    "edge.168.1.1 10.0.0.255. 256.1.1.1",
    "frakking unfrak frak-ing frak.",  # word-boundary lookarounds
    "nbsp\xa0gorram\xa0end",  # nbsp is not [A-Za-z] → scrub applies
    "newline\nfrak\nend 123-45-6789\n",
]


def test_python_scrub_values():
    assert scrub_text_py("mail a.b@x.co now") == "mail <EMAIL> now"
    assert scrub_text_py("ssn 123-45-6789.") == "ssn <SSN>."
    assert scrub_text_py("ip 10.0.0.1.") == "ip <IP>."
    assert scrub_text_py("1.2.3.4.5") == "1.2.3.4.5"  # not an IPv4
    assert scrub_text_py("what the FRAK!") == "what the <TOX>!"
    assert scrub_text_py("frakking") == "frakking"  # whole word only
    assert scrub_text_py(None) is None


def test_jvm_python_byte_identity(spark):
    pdf = pd.DataFrame({"id": range(len(ADVERSARIAL)), "text": ADVERSARIAL})
    df = spark.createDataFrame(pdf)
    got = (
        df.select("id", scrub_column(F.col("text")).alias("s"))
        .toPandas()
        .sort_values("id")["s"]
        .tolist()
    )
    want = scrub_series_py(pdf["text"]).tolist()
    assert got == want


def test_scrub_series_matches_scalar():
    s = pd.Series(ADVERSARIAL + [None])
    vec = scrub_series_py(s).tolist()
    scal = [scrub_text_py(x) for x in s]
    assert [v if isinstance(v, str) else None for v in vec] == scal


def test_core_chain_jvm_python_re2_identity(spark):
    """The lookaround-free core chain must agree byte-for-byte across
    all THREE engines (JVM regexp_replace, Python re, DuckDB RE2) —
    it backs the scrub_chain_core value-hash oracle."""
    import re

    import duckdb

    from pcornet_data_curation_spark.functions.scrub import (
        CORE_SCRUB_PATTERNS,
        ordered_patterns,
        scrub_core_sql,
    )

    def core_py(t):
        for p in ordered_patterns(CORE_SCRUB_PATTERNS):
            t = re.sub(p.pattern, p.replacement, t)
        return t

    rows = [t for t in ADVERSARIAL if t is not None]
    pdf = pd.DataFrame({"id": range(len(rows)), "text": rows})
    df = spark.createDataFrame(pdf)
    got = (
        df.select("id", scrub_column(F.col("text"), CORE_SCRUB_PATTERNS).alias("s"))
        .toPandas().sort_values("id")["s"].tolist()
    )
    want_py = [core_py(t) for t in rows]
    assert got == want_py
    con = duckdb.connect()
    con.register("t", pdf)
    want_duck = (
        con.sql(f"SELECT id, {scrub_core_sql('text')} AS s FROM t ORDER BY id")
        .df()["s"].tolist()
    )
    assert got == want_duck


def test_scrub_hit_counts_chain_aware(spark):
    """scrub_hit_count_cols counts exactly the matches scrub_column
    replaces: a phone-shaped string consumed by the earlier email rule
    must NOT also count as a phone; later rules see transformed text."""
    from pyspark.sql import functions as F

    from pcornet_data_curation_spark.functions.scrub import (
        CORE_SCRUB_PATTERNS,
        scrub_hit_count_cols,
    )

    df = spark.createDataFrame(
        [(1, "mail 555-123-4567@example.com then call 555-123-4567 from 1.2.3.4")],
        "doc_id long, text string",
    )
    pairs = scrub_hit_count_cols(F.col("text"), CORE_SCRUB_PATTERNS)
    out = df.select(*[h.alias(r) for r, h in pairs]).toPandas().iloc[0]
    assert out["core_email"] == 1
    assert out["core_phone"] == 1  # the one inside the email was consumed
    assert out["core_ipv4"] == 1
    assert out["core_ssn"] == 0 and out["core_tox"] == 0 and out["core_card"] == 0

    # the DEFAULT chain is the production one (same default as
    # scrub_column), so audit counts describe scrubs that actually
    # happened: a digit-prefixed phone shape is guarded by pii_phone's
    # lookbehind (not scrubbed, not counted) while the lookaround-free
    # core twin counts it
    guarded = spark.createDataFrame(
        [(1, "id9555-123-4567 is an identifier not a phone")],
        "doc_id long, text string",
    )
    prod = guarded.select(
        *[h.alias(r) for r, h in scrub_hit_count_cols(F.col("text"))]
    ).toPandas().iloc[0]
    core = guarded.select(
        *[h.alias(r) for r, h in scrub_hit_count_cols(F.col("text"), CORE_SCRUB_PATTERNS)]
    ).toPandas().iloc[0]
    assert prod["pii_phone"] == 0 and core["core_phone"] == 1
