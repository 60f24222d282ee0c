"""Corpus-shaping operators: decontamination, stratified sampling,
token-shard packing, and the Gopher top-n-gram repetition signal.
Value-level parity with the DuckDB oracles is driver-checked
(tools/check_oracle.py); these tests pin SEMANTICS and PLAN SHAPE."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pcornet_data_curation_spark.operators.decontam import contamination_flags
from pcornet_data_curation_spark.operators.sampling import (
    pack_token_shards,
    stratified_sample,
    uniform_hash_col,
)
from pcornet_data_curation_spark.operators.textanalysis import topgram_repetition


def test_topgram_repetition_semantics(spark):
    rows = [
        (1, "a b a b a b"),          # top 2-gram "a b" x3 of 5 grams
        (2, "one two three four"),   # all 2-grams unique
        (3, "x"),                    # < k tokens -> no grams
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = topgram_repetition(df, k=2).toPandas().set_index("doc_id").sort_index()
    r1 = out.loc[1]
    assert r1["top_gram"] == "a b" and r1["top_gram_n"] == 3 and r1["grams_n"] == 5
    # covered = len("a b")*3 = 9 of 11 normalized chars
    assert r1["top_gram_char_frac"] == pytest.approx(9 / 11)
    assert out.loc[2, "top_gram_n"] == 1 and out.loc[2, "grams_n"] == 3
    for d in (3, 4, 5):
        assert out.loc[d, "grams_n"] == 0 and out.loc[d, "top_gram_char_frac"] == 0.0
        assert pd.isna(out.loc[d, "top_gram"])
    # tie-break: equal counts resolve to the lexicographically-largest gram
    tie = spark.createDataFrame([(9, "b c a d b c a d")], "doc_id long, text string")
    t = topgram_repetition(tie, k=2).toPandas().iloc[0]
    # grams: "b c","c a","a d" each x2, "d b" x1 -> largest of the tied
    assert t["top_gram_n"] == 2 and t["top_gram"] == "c a"


def test_contamination_flags_semantics_and_broadcast(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (2, "alpha beta gamma delta epsilon zeta eta theta different tail"),
            (3, "totally unrelated words in this training document here now"),
            (4, "short"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "ALPHA beta gamma delta epsilon zeta eta theta")],  # case-blind
        "doc_id long, text string",
    )
    out = contamination_flags(docs, bench, k=8).toPandas().set_index("doc_id").sort_index()
    assert bool(out.loc[1, "contaminated"]) and bool(out.loc[2, "contaminated"])
    assert not out.loc[3, "contaminated"] and not out.loc[4, "contaminated"]
    assert out.loc[4, "grams_n"] == 0 and out.loc[5, "grams_n"] == 0
    # small benchmark -> the corpus-side join must be a broadcast probe
    plan = contamination_flags(docs, bench, k=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # forcing the fallback keeps results identical (shuffled equi-join)
    big = (
        contamination_flags(docs, bench, k=8, broadcast_max_grams=0)
        .toPandas().set_index("doc_id").sort_index()
    )
    pd.testing.assert_frame_equal(out, big)


def test_decontaminate_remove_cuts_only_the_leaked_span(spark):
    """Remove-mode: a doc with one contaminated paragraph keeps the
    rest BYTE-EXACT (normalized form) — exactly the covered tokens go;
    clean docs come back normalized-whole; fully-leaked docs empty."""
    from pcornet_data_curation_spark.operators.decontam import decontaminate_remove

    leak = "alpha beta gamma delta epsilon zeta eta theta"      # 8 tokens
    head = "perfectly clean opening paragraph with original prose here"
    tail = "and an equally clean closing paragraph follows after it"
    docs = spark.createDataFrame(
        [
            (1, f"{head} {leak} {tail}"),    # one leaked paragraph inside
            (2, head),                        # clean
            (3, leak),                        # fully leaked
            (4, None),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, leak.upper())], "doc_id long, text string")
    out = (
        decontaminate_remove(docs, bench, k=8)
        .toPandas().set_index("doc_id").sort_index()
    )
    assert out.loc[1, "text_decontaminated"] == f"{head} {tail}"   # byte-exact
    assert out.loc[1, "removed_tokens_n"] == 8 and bool(out.loc[1, "contaminated"])
    assert out.loc[2, "text_decontaminated"] == head
    assert out.loc[2, "removed_tokens_n"] == 0 and not out.loc[2, "contaminated"]
    assert out.loc[3, "text_decontaminated"] == "" and bool(out.loc[3, "contaminated"])
    assert out.loc[4, "text_decontaminated"] == "" and out.loc[4, "tokens_n"] == 0
    # overlapping hits never double-count a token: extend the leak by
    # one token so two anchored 8-grams overlap on 7 tokens
    docs2 = spark.createDataFrame(
        [(1, f"{head} {leak} omega {tail}")], "doc_id long, text string"
    )
    bench2 = spark.createDataFrame(
        [(100, f"{leak} omega")], "doc_id long, text string"
    )
    o2 = decontaminate_remove(docs2, bench2, k=8).toPandas().iloc[0]
    assert o2["text_decontaminated"] == f"{head} {tail}"
    assert o2["removed_tokens_n"] == 9


def test_stratified_sample_deterministic_and_calibrated(spark):
    n = 4000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").when(F.col("id") % 3 == 1, "de")
        .otherwise(F.lit(None)).alias("lang"),
    )
    rates = {"en": 0.2, "de": 0.9}
    a = stratified_sample(df, "lang", rates, default_rate=0.5, seed=3).toPandas()
    b = (
        stratified_sample(df.repartition(13), "lang", rates, default_rate=0.5, seed=3)
        .toPandas()
    )
    # identical rows regardless of partitioning (the df.sample failure mode)
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    got = a.groupby(a["lang"].fillna("_null"))["doc_id"].count() / (n / 3)
    assert got["en"] == pytest.approx(0.2, abs=0.04)
    assert got["de"] == pytest.approx(0.9, abs=0.04)
    assert got["_null"] == pytest.approx(0.5, abs=0.05)  # default rate
    # different seed -> different (but similarly sized) sample
    c = stratified_sample(df, "lang", rates, default_rate=0.5, seed=4).toPandas()
    assert sorted(c["doc_id"]) != sorted(a["doc_id"])
    # uniform really is [0,1): bounds hold on a direct column probe
    u = df.select(uniform_hash_col(F.col("doc_id"), 3).alias("u")).toPandas()["u"]
    assert (u >= 0).all() and (u < 1).all()


def test_pack_token_shards_greedy_bounds(spark):
    rows = [(i, "s1", 400) for i in range(10)] + [(i + 100, "s2", 1500) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = (
        pack_token_shards(df, "n_tokens", target_tokens=1000, part_col="source")
        .toPandas().sort_values(["source", "doc_id"]).reset_index(drop=True)
    )
    s1 = out[out.source == "s1"]
    # 400-token docs against a 1000 target: shards of 3,2,3,2 docs
    # (boundary doc stays in the earlier shard)
    assert s1["shard_id"].tolist() == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]
    s2 = out[out.source == "s2"]
    # each 1500-token doc crosses a boundary alone
    assert s2["shard_id"].tolist() == [0, 1, 3, 4]
    # shard token totals never exceed target + one document
    tot = out.groupby(["source", "shard_id"])["n_tokens"].sum()
    assert (tot <= 1000 + out["n_tokens"].max()).all()
    # running-sum bookkeeping is exact
    assert s1["shard_tokens_before"].tolist() == [400 * i for i in range(10)]


def test_hash_split_deterministic_and_exclusive(spark):
    from pcornet_data_curation_spark.operators.sampling import hash_split

    df = spark.range(6000).select(F.col("id").alias("doc_id"))
    a = hash_split(df, {"train": 0.9, "val": 0.05, "test": 0.05}, seed=1).toPandas()
    b = (
        hash_split(df.repartition(17), {"train": 0.9, "val": 0.05, "test": 0.05}, seed=1)
        .toPandas()
    )
    # leakage-free: identical assignment regardless of partitioning
    am = dict(zip(a.doc_id, a.split))
    bm = dict(zip(b.doc_id, b.split))
    assert am == bm
    frac = a["split"].value_counts(normalize=True)
    assert frac["train"] == pytest.approx(0.9, abs=0.02)
    assert frac["val"] == pytest.approx(0.05, abs=0.01)
    assert frac["test"] == pytest.approx(0.05, abs=0.01)
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(df, {"train": 0.5, "val": 0.4})


def test_nfc_normalize_through_spark(spark):
    """Composed and decomposed forms normalize to the same bytes; NULL
    passes through; compatibility (NFKC-only) characters are preserved
    (NFC is canonical-only)."""
    from pcornet_data_curation_spark.operators.textanalysis import nfc_normalize_text

    rows = [
        (1, "café"),    # decomposed e + combining acute
        (2, "café"),     # precomposed
        (3, "ﬁle"),      # LATIN SMALL LIGATURE FI — NFC keeps it
        (4, None),
        (5, "plain ascii"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = nfc_normalize_text(df).toPandas().set_index("doc_id")["text_nfc"]
    assert out[1] == out[2] == "café"
    assert out[3] == "ﬁle"
    assert out[4] is None and out[5] == "plain ascii"


def test_block_dedup_semantics(spark):
    """Duplicate-span removal: globally repeated 25-token blocks keep
    exactly the (min doc_id, min idx) occurrence; within-doc repeats
    are removed too; untouched docs come back whitespace-normalized;
    the transform is idempotent."""
    from pcornet_data_curation_spark.operators.spandedup import block_dedup

    boiler = " ".join(f"w{i}" for i in range(25))       # one exact block
    uniq_a = " ".join(f"a{i}" for i in range(25))
    uniq_b = " ".join(f"b{i}" for i in range(10))        # partial tail block
    rows = [
        (1, f"{boiler} {uniq_a}"),                       # first occurrence
        (2, f"{boiler} {uniq_b}"),                       # later doc: boiler removed
        (3, f"{boiler} {boiler}"),                       # within-doc repeat: all removed
        (4, "short  doc   here"),                        # < 1 block, ws-normalized
        (5, None),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = block_dedup(df, block_tokens=25).toPandas().set_index("doc_id").sort_index()
    assert out.loc[1, "text_deduped"] == f"{boiler} {uniq_a}"
    assert out.loc[1, "removed_blocks_n"] == 0
    assert out.loc[2, "text_deduped"] == uniq_b and out.loc[2, "removed_blocks_n"] == 1
    assert out.loc[3, "text_deduped"] == "" and out.loc[3, "removed_blocks_n"] == 2
    assert out.loc[4, "text_deduped"] == "short doc here"
    for d in (5, 6):
        assert out.loc[d, "text_deduped"] == "" and out.loc[d, "blocks_n"] == 0
    # idempotent: running again over the deduped text removes nothing
    again = block_dedup(
        spark.createDataFrame(
            [(int(i), t) for i, t in out["text_deduped"].items()],
            "doc_id long, text string",
        ),
        block_tokens=25,
    ).toPandas()
    assert (again["removed_blocks_n"] == 0).all()


def test_block_dedup_cdc_catches_straddling_duplicate(spark):
    """The r4-verdict gap pinned: a shared span whose offset differs
    between two docs by a non-multiple of the block size survives the
    fixed 25-token grid but is caught by content-defined anchors
    (boundaries re-synchronize inside the span regardless of offset).
    Also: token conservation, empty/NULL handling, idempotence."""
    from pcornet_data_curation_spark.operators.spandedup import (
        block_dedup,
        block_dedup_cdc,
    )

    span = " ".join(f"s{i}" for i in range(400))   # long shared span
    pre = " ".join(f"p{i}" for i in range(13))     # 13-token offset: off-grid
    rows = [
        (1, span + " " + " ".join(f"a{i}" for i in range(30))),
        (2, pre + " " + span),
        (3, "tiny doc"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    grid = block_dedup(df).toPandas().set_index("doc_id").sort_index()
    assert grid.loc[2, "removed_blocks_n"] == 0   # the grid MISSES it

    cdc = block_dedup_cdc(df).toPandas().set_index("doc_id").sort_index()
    assert cdc.loc[1, "removed_blocks_n"] == 0    # first occurrence kept whole
    assert cdc.loc[2, "removed_blocks_n"] > 0     # CDC catches the straddle
    assert cdc.loc[2, "text_deduped"].startswith("p0 p1")
    # interior span tokens of doc 2 are gone (resynchronized blocks)
    assert " s100 " not in f' {cdc.loc[2, "text_deduped"]} '
    assert cdc.loc[3, "text_deduped"] == "tiny doc"
    for d in (4, 5):
        assert cdc.loc[d, "text_deduped"] == "" and cdc.loc[d, "blocks_n"] == 0
    # portable (md5) boundary variant: same machinery, same invariants
    cdcp = block_dedup_cdc(df, portable_boundaries=True).toPandas().set_index(
        "doc_id"
    ).sort_index()
    assert cdcp.loc[2, "removed_blocks_n"] > 0
    # idempotent: a second pass over the deduped text removes nothing
    again = block_dedup_cdc(
        spark.createDataFrame(
            [(int(i), t) for i, t in cdc["text_deduped"].items()],
            "doc_id long, text string",
        )
    ).toPandas()
    assert (again["removed_blocks_n"] == 0).all()


def test_line_dedup_keeps_one_global_occurrence(spark):
    """Corpus-wide duplicate-line removal: a boilerplate line repeated
    across docs keeps exactly the (min doc_id, min idx) occurrence;
    within-doc repeats removed; empty lines dropped (idempotence);
    reassembly preserves original line order with '\\n'."""
    from pcornet_data_curation_spark.operators.spandedup import line_dedup

    rows = [
        (1, "unique alpha\ncookie banner\nunique beta"),
        (2, "cookie banner\nunique gamma"),            # banner cut (doc 1 keeps)
        (3, "same line\n\nsame line"),                 # within-doc repeat
        (4, "  spaced   \n"),                          # trims, drops empties
        (5, None),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = line_dedup(df).toPandas().set_index("doc_id").sort_index()
    assert out.loc[1, "text_deduped"] == "unique alpha\ncookie banner\nunique beta"
    assert out.loc[1, "removed_lines_n"] == 0
    assert out.loc[2, "text_deduped"] == "unique gamma"
    assert out.loc[2, "removed_lines_n"] == 1 and out.loc[2, "lines_n"] == 2
    assert out.loc[3, "text_deduped"] == "same line"
    assert out.loc[3, "removed_lines_n"] == 1
    assert out.loc[4, "text_deduped"] == "spaced" and out.loc[4, "lines_n"] == 1
    for d in (5, 6):
        assert out.loc[d, "text_deduped"] == "" and out.loc[d, "lines_n"] == 0
    # idempotent: second pass removes nothing
    again = line_dedup(
        spark.createDataFrame(
            [(int(i), t) for i, t in out["text_deduped"].items()],
            "doc_id long, text string",
        )
    ).toPandas()
    assert (again["removed_lines_n"] == 0).all()


def test_c4_line_filter_predicates_and_page_rule(spark):
    """Each C4 predicate exercised on its own line: short lines, no
    terminal punctuation, and javascript mentions drop; sentences and
    quote-terminated lines survive; page keep = >= min_lines
    survivors; NULL/empty text yields an empty kept page."""
    from pcornet_data_curation_spark.operators.c4 import c4_line_filter

    good = "The quick brown fox jumps over the lazy dog."
    rows = [
        (1, f"{good}\nAnother fine sentence stands right here.\n"
            f'He said "five words are enough."\nRead more\n'
            f"Enable JavaScript to view this site.\n"
            f"No terminal punctuation on this line"),
        (2, f"{good}\nShort one.\nnav"),   # only 1 survivor -> page dropped
        (3, None),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = c4_line_filter(df).toPandas().set_index("doc_id").sort_index()
    kept1 = out.loc[1, "text_clean"].split("\n")
    assert kept1 == [
        good,
        "Another fine sentence stands right here.",
        'He said "five words are enough."',
    ]
    assert out.loc[1, "lines_n"] == 6 and out.loc[1, "lines_kept"] == 3
    assert bool(out.loc[1, "keep"])
    assert out.loc[2, "lines_kept"] == 1 and not out.loc[2, "keep"]
    for d in (3, 4):
        assert out.loc[d, "text_clean"] == "" and out.loc[d, "lines_n"] == 0
        assert not out.loc[d, "keep"]
    # parameter overrides: min_words=2 admits 'Short one.'
    loose = c4_line_filter(df, min_words=2, min_lines=2).toPandas().set_index("doc_id")
    assert loose.loc[2, "lines_kept"] == 2 and bool(loose.loc[2, "keep"])


def test_url_canonical_dedup_collapses_equivalent_urls(spark):
    """Canonicalization: host/scheme case, default ports, fragments,
    and tracking params normalize away; path case and real params
    survive; non-urls stay distinct (fragment-stripped only); keeper
    is the min doc_id per canonical key."""
    from pcornet_data_curation_spark.operators.urlnorm import url_canonical_dedup

    rows = [
        (1, "HTTP://WWW.Example.com:80/Path?utm_source=x&a=1#frag"),
        (2, "http://www.example.com/Path?a=1"),            # same resource as 1
        (3, "https://Host.org:443"),                       # empty path -> '/'
        (4, "https://host.org/#top"),                      # same as 3
        (5, "https://host.org/?utm_a=1&utm_b=2"),          # tracking-only query
        (6, "http://www.example.com/path?a=1"),            # path CASE differs: distinct
        (7, "not a url #fragment"),
        (8, "https://h.io/p?a=1&utm_x=9&b=2"),             # interior tracking param
        (9, "https://h.io/p&utm_x=1"),                     # '&' in PATH: must survive
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = url_canonical_dedup(df).toPandas().set_index("doc_id").sort_index()
    assert out.loc[1, "canonical_url"] == "http://www.example.com/Path?a=1"
    assert out.loc[2, "canonical_url"] == out.loc[1, "canonical_url"]
    assert bool(out.loc[1, "is_canonical_keeper"])
    assert not out.loc[2, "is_canonical_keeper"]
    assert out.loc[3, "canonical_url"] == "https://host.org/"
    assert out.loc[4, "canonical_url"] == "https://host.org/"
    assert out.loc[5, "canonical_url"] == "https://host.org/"
    assert bool(out.loc[3, "is_canonical_keeper"])
    assert out.loc[6, "canonical_url"] == "http://www.example.com/path?a=1"
    assert bool(out.loc[6, "is_canonical_keeper"])
    assert out.loc[7, "canonical_url"] == "not a url "
    assert out.loc[8, "canonical_url"] == "https://h.io/p?a=1&b=2"
    # tracking-lookalike in the path is NOT a tracking param (RFC 3986:
    # '&' is a legal pchar) — a distinct resource stays distinct
    assert out.loc[9, "canonical_url"] == "https://h.io/p&utm_x=1"
    assert bool(out.loc[9, "is_canonical_keeper"])


def test_domain_temperature_sample_rates_and_determinism(spark):
    """keep_rate follows (n_min/n_d)^(1-alpha) exactly; the smallest
    domain keeps everything; realized keep fractions calibrate to the
    rate; assignment is partitioning-invariant (deterministic hash,
    not df.sample)."""
    from pcornet_data_curation_spark.operators.sampling import (
        domain_temperature_sample,
    )

    n = 6000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 8, "web")       # 4800 docs
        .when(F.col("id") % 10 == 8, "books")     # 600
        .otherwise("wiki")                        # 600
        .alias("source"),
    )
    a = domain_temperature_sample(df, alpha=0.5, seed=11).toPandas()
    rates = a.groupby("source")["keep_rate"].first()
    assert rates["books"] == pytest.approx(1.0)
    assert rates["wiki"] == pytest.approx(1.0)
    assert rates["web"] == pytest.approx((600 / 4800) ** 0.5)
    got = a[a.keep].groupby("source")["doc_id"].count()
    assert got["web"] / 4800 == pytest.approx(rates["web"], abs=0.03)
    assert got["books"] == 600 and got["wiki"] == 600
    # partitioning-invariant
    b = domain_temperature_sample(df.repartition(13), alpha=0.5, seed=11).toPandas()
    am = dict(zip(a.doc_id, a.keep))
    bm = dict(zip(b.doc_id, b.keep))
    assert am == bm
    # alpha=1 keeps everything
    full = domain_temperature_sample(df, alpha=1.0, seed=11).toPandas()
    assert full["keep"].all()


def test_vocab_stats_two_level_agg_and_cut(spark):
    """term_freq counts every occurrence, doc_freq counts documents
    once; lowercase folds case; the top_n cut follows the total
    (term_freq desc, token) order; min_doc_freq filters hapax-per-doc
    noise; case-sensitive mode keeps case distinct."""
    from pcornet_data_curation_spark.operators.textanalysis import vocab_stats

    rows = [
        (1, "The cat saw the cat"),
        (2, "a cat naps"),
        (3, "THE end"),
        (4, None),
        (5, "   "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = vocab_stats(df, top_n=10).toPandas().set_index("token")
    assert out.loc["the", "term_freq"] == 3 and out.loc["the", "doc_freq"] == 2
    assert out.loc["cat", "term_freq"] == 3 and out.loc["cat", "doc_freq"] == 2
    assert out.loc["a", "doc_freq"] == 1
    # deterministic order: ties by token ascending after term_freq desc
    ordered = vocab_stats(df, top_n=3).toPandas()["token"].tolist()
    assert ordered == ["cat", "the", "a"]
    # min_doc_freq drops single-doc tokens
    md = vocab_stats(df, min_doc_freq=2).toPandas()["token"].tolist()
    assert sorted(md) == ["cat", "the"]
    cs = vocab_stats(df, lowercase=False, top_n=20).toPandas().set_index("token")
    assert cs.loc["The", "term_freq"] == 1 and cs.loc["THE", "term_freq"] == 1


def test_domain_cap_matches_naive_rank_and_boundary_path(spark):
    """The histogram selection must equal the naive global
    row_number rank exactly — including inside the boundary bucket —
    and under-cap domains keep everything."""
    import hashlib

    from pcornet_data_curation_spark.operators.sampling import domain_cap

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 20 < 19, "bulk").otherwise("tail").alias("source"),
    )
    out = domain_cap(df, cap=137, seed=5, n_buckets=8).toPandas()
    assert len(out) == 2000  # no row lost in the three-way union

    def u(i):
        return int(hashlib.md5(f"{i}:5".encode()).hexdigest()[:8], 16) / 2**32

    out["u"] = out.doc_id.map(u)
    for dom, g in out.groupby("source"):
        naive = set(g.sort_values(["u", "doc_id"]).head(137).doc_id)
        got = set(g[g.keep].doc_id)
        assert got == naive, dom
    assert (out[out.source == "bulk"]["domain_n"] == 1900).all()
    # under-cap domain: all kept (the all-keep path, no window at all)
    assert out[out.source == "tail"]["keep"].all()
    # partitioning-invariance
    out2 = domain_cap(df.repartition(17), cap=137, seed=5, n_buckets=8).toPandas()
    assert dict(zip(out.doc_id, out.keep)) == dict(zip(out2.doc_id, out2.keep))


def test_dedup_against_snapshot_flags(spark):
    """in_snapshot and dup_in_batch are independent signals; keep is
    their conjunction; NULL text folds to '' (both flagged against an
    empty-text snapshot entry); the snapshot side never needs ids."""
    from pcornet_data_curation_spark.operators.dedup import dedup_against_snapshot

    snap = spark.createDataFrame(
        [(900, "old page"), (901, ""), (902, "old page")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (1, "old page"),     # unchanged since snapshot
            (2, "new page"),     # fresh, first occurrence
            (3, "new page"),     # within-batch dup of 2
            (4, None),           # NULL -> '' -> in snapshot
            (5, "old page"),     # in snapshot AND batch-dup of 1
        ],
        "doc_id long, text string",
    )
    out = (
        dedup_against_snapshot(batch, snap)
        .toPandas().set_index("doc_id").sort_index()
    )
    assert bool(out.loc[1, "in_snapshot"]) and not out.loc[1, "dup_in_batch"]
    assert not out.loc[2, "in_snapshot"] and not out.loc[2, "dup_in_batch"]
    assert bool(out.loc[2, "keep"])
    assert out.loc[3, "dup_in_batch"] and not out.loc[3, "keep"]
    assert bool(out.loc[4, "in_snapshot"]) and not out.loc[4, "keep"]
    assert bool(out.loc[5, "in_snapshot"]) and bool(out.loc[5, "dup_in_batch"])
    assert list(out["keep"]) == [False, True, False, False, False]


def test_boilerplate_lines_classes_and_context(spark):
    """Initial classes from stopword density/length/markers; jusText
    one-hop context: NEAR survives only ADJACENT to a GOOD line (a
    junk line between them blocks promotion); empty/NULL docs yield
    ratio 0.0 and empty content."""
    from pcornet_data_curation_spark.operators.boilerplate import boilerplate_lines

    good = (
        "it was the best of all the times and it was also the worst of "
        "the times that we had in the old city by the sea."
    )
    near = "The launch happened quickly."
    mark = "© 2024 Example Corp — All Rights Reserved."
    junk = "xyzzy plugh"
    rows = [
        (0, "\n".join([good, near, mark])),  # NEAR promoted by prev GOOD
        (1, "\n".join([mark, near, junk])),  # NEAR orphaned: dropped
        (2, "\n".join([good, junk, near])),  # junk blocks adjacency
        (3, "\n".join([near, good, near])),  # both NEARs promoted
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = boilerplate_lines(df).toPandas().set_index("doc_id").sort_index()
    assert out.loc[0, "text_content"] == good + "\n" + near
    assert out.loc[0, "lines_n"] == 3 and out.loc[0, "content_n"] == 2
    assert out.loc[1, "text_content"] == "" and out.loc[1, "content_n"] == 0
    assert out.loc[1, "boilerplate_ratio"] == 1.0
    assert out.loc[2, "text_content"] == good
    assert out.loc[3, "text_content"] == "\n".join([near, good, near])
    assert out.loc[4, "lines_n"] == 0 and out.loc[4, "boilerplate_ratio"] == 0.0
    assert out.loc[5, "text_content"] == ""


def test_dup_cluster_stats_histogram(spark):
    """Chain, two pairs, and a star collapse to the right histogram;
    transitive closure merges the chain, singletons never appear."""
    from pcornet_data_curation_spark.operators.dedup import dup_cluster_stats

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (30, 31), (30, 32), (30, 33)],
        "id_a long, id_b long",
    )
    out = dup_cluster_stats(pairs).toPandas().set_index("cluster_size").sort_index()
    assert list(out.index) == [2, 3, 4]
    assert out.loc[2, "n_clusters"] == 2 and out.loc[2, "n_docs"] == 4
    assert out.loc[2, "n_removable"] == 2
    assert out.loc[3, "n_clusters"] == 1 and out.loc[3, "n_removable"] == 2
    assert out.loc[4, "n_clusters"] == 1 and out.loc[4, "n_docs"] == 4
    assert out.loc[4, "n_removable"] == 3


def test_mojibake_fix_repairs_cp1252_round(spark):
    """The broken form of any repaired char is computed from the same
    byte arithmetic that created it; repair is byte-exact, ASCII and
    NULL pass through, changed flags the difference."""
    from pcornet_data_curation_spark.operators.mojibake import (
        _sloppy_cp1252,
        mojibake_fix,
    )

    clean = "Café — “don’t” naïve\xa0fin… 100€ •"
    broken = _sloppy_cp1252(clean.encode("utf-8"))
    assert broken != clean and "Ã" in broken
    rows = [(1, broken), (2, "plain ascii text."), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = mojibake_fix(df).toPandas().set_index("doc_id").sort_index()
    assert out.loc[1, "text_fixed"] == clean and bool(out.loc[1, "changed"])
    assert out.loc[2, "text_fixed"] == "plain ascii text."
    assert not out.loc[2, "changed"]
    assert out.loc[3, "text_fixed"] == "" and not out.loc[3, "changed"]


def test_robots_meta_directive_parsing(spark):
    """Attribute order and quoting free; ALL robots tags combine with
    most-restrictive winning; token (not substring) matching; name
    value-equality (no prefix/other-attr lookalikes); multi-line tags
    parse; none implies both; binary html decodes; NULL html carries
    no directive."""
    from pcornet_data_curation_spark.operators.robotsmeta import robots_meta

    rows = [
        (1, '<head><meta name="robots" content="noindex, nofollow"></head>'),
        (2, "<head><meta content='nofollow' name=robots></head>"),
        (3, '<head><meta name="robots" content="index, follow"></head>'),
        (4, '<head><meta name="viewport" content="width=device-width"></head>'),
        (5, "<head><meta name=ROBOTS content=none></head>"),
        (6, '<head><meta name="robots" content="noindexfoo"></head>'),  # not a token
        (7, '<head><meta name="robots" content="index">'
            '<meta name="robots" content="noindex"></head>'),  # most restrictive wins
        (8, None),
        (9, '<head><meta name=robots\n content=noindex\n></head>'),  # prettified
        (10, '<head><meta name="robots-extra" content="noindex"></head>'),  # lookalike
        (11, '<head><meta name="keywords" content="name=robots noindex"></head>'),
        (12, '<head><meta name="robots" content="noindex,\nnofollow"></head>'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    out = robots_meta(df).toPandas().set_index("doc_id").sort_index()
    assert bool(out.loc[1, "robots_noindex"]) and bool(out.loc[1, "robots_nofollow"])
    assert not out.loc[2, "robots_noindex"] and bool(out.loc[2, "robots_nofollow"])
    assert not out.loc[3, "robots_noindex"] and not out.loc[3, "robots_nofollow"]
    assert out.loc[4, "robots_directives"] == ""
    assert bool(out.loc[5, "robots_noindex"]) and bool(out.loc[5, "robots_nofollow"])
    assert not out.loc[6, "robots_noindex"]
    assert bool(out.loc[7, "robots_noindex"])  # later noindex overrides index
    assert out.loc[8, "robots_directives"] == "" and not out.loc[8, "robots_noindex"]
    assert bool(out.loc[9, "robots_noindex"])  # newline-wrapped attributes
    assert out.loc[10, "robots_directives"] == ""  # name prefix is NOT robots
    assert out.loc[11, "robots_directives"] == ""  # name= inside a VALUE ignored
    assert bool(out.loc[12, "robots_noindex"]) and bool(out.loc[12, "robots_nofollow"])

    bin_df = spark.createDataFrame(
        [(9, '<meta name="robots" content="noindex">'.encode())],
        "doc_id long, html binary",
    )
    b = robots_meta(bin_df).toPandas().iloc[0]
    assert bool(b["robots_noindex"])


def test_dedup_against_snapshot_null_and_duplicate_ids(spark):
    """Row preservation under degenerate keys: a NULL-id row survives
    the payload join (null-safe match) with valid fp-based in_snapshot
    and dup_in_batch False (no orderable survivor among unidentifiable
    rows); duplicate-id rows come back exactly once each (flags OR'd
    over the copies), never multiplied."""
    from pcornet_data_curation_spark.operators.dedup import dedup_against_snapshot

    snap = spark.createDataFrame([(900, "old page")], "doc_id long, text string")
    batch = spark.createDataFrame(
        [
            (None, "old page"),   # NULL id, text in snapshot
            (None, "fresh one"),  # NULL id, new text
            (7, "same id text"),  # duplicate id...
            (7, "old page"),      # ...one copy's text in snapshot
            (8, "fresh two"),
        ],
        "doc_id long, text string",
    )
    out = dedup_against_snapshot(batch, snap).toPandas()
    assert len(out) == 5  # no row loss, no multiplication
    nulls = out[out.doc_id.isna()]
    assert len(nulls) == 2
    assert set(nulls.in_snapshot) == {True} or sorted(nulls.in_snapshot) == [False, True]
    assert not nulls.dup_in_batch.any()
    seven = out[out.doc_id == 7]
    assert len(seven) == 2
    # flags are per-id (OR over copies): both rows agree
    assert len(set(seven.in_snapshot)) == 1 and bool(seven.in_snapshot.iloc[0])
    assert bool(out[out.doc_id == 8].keep.iloc[0])


def test_c4_sentence_dedup_alignment_and_marking(spark):
    """C4 three-sentence-span dedup (c4.c4_sentence_dedup): a shared
    span is removed from every occurrence except the globally-first
    one EVEN when its sentence alignment differs between docs (the
    case a fixed block grid misses); a within-doc repeat keeps only
    the first occurrence; docs with no repeated span come back
    byte-identical to their normalized text; < window sentences means
    no spans and no edits."""
    from pcornet_data_curation_spark.operators.c4 import c4_sentence_dedup

    b = ("One shared sentence here. Another shared sentence follows! "
         "A third shared sentence ends?")
    rows = [
        (1, f"Unique opening for doc one. {b} Unique tail for doc one."),
        # same span, different alignment (two lead sentences, not one)
        (2, f"Doc two starts differently with words. Padding sentence two! {b}"),
        (3, "Short doc."),
        (4, None),
        (5, "Solo doc with parts. Second part of solo doc! Third part of it?"),
        (6, f"{b} Middle unique six. {b}"),  # within-doc repeat
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = c4_sentence_dedup(df).toPandas().set_index("doc_id").sort_index()

    # doc 1 holds the global keeper occurrence -> unchanged, byte-equal
    assert out.loc[1, "text_deduped"] == rows[0][1]
    assert out.loc[1, "removed_sentences_n"] == 0
    assert out.loc[1, "sentences_n"] == 5 and out.loc[1, "windows_n"] == 3
    # doc 2 loses the 3 shared sentences despite the alignment shift
    assert out.loc[2, "text_deduped"] == (
        "Doc two starts differently with words. Padding sentence two!"
    )
    assert out.loc[2, "removed_sentences_n"] == 3
    # short / NULL docs: no windows, never edited
    assert out.loc[3, "text_deduped"] == "Short doc." and out.loc[3, "windows_n"] == 0
    assert out.loc[4, "text_deduped"] == "" and out.loc[4, "sentences_n"] == 0
    # a doc whose spans are all unique is reconstructed byte-identically
    assert out.loc[5, "text_deduped"] == rows[4][1]
    assert out.loc[5, "removed_sentences_n"] == 0
    # within-doc repeat: both occurrences are non-keepers (doc 1 holds
    # the span's global keeper), so only the middle sentence survives
    assert out.loc[6, "text_deduped"] == "Middle unique six."
    assert out.loc[6, "removed_sentences_n"] == 6

    # without doc 1, doc 6's FIRST occurrence becomes the keeper
    solo = (
        c4_sentence_dedup(df.where("doc_id = 6"))
        .toPandas().set_index("doc_id")
    )
    assert solo.loc[6, "text_deduped"] == f"{b} Middle unique six."
    assert solo.loc[6, "removed_sentences_n"] == 3


def test_c4_sentence_dedup_window_override(spark):
    """window=2 catches a two-sentence repeat the default window=3
    cannot see (no doc has 3+ repeated consecutive sentences)."""
    from pcornet_data_curation_spark.operators.c4 import c4_sentence_dedup

    pair = "Shared first sentence here. Shared second sentence there!"
    rows = [
        (1, f"{pair} Tail of the first doc."),
        (2, f"Fresh opening of doc two. {pair}"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    w3 = c4_sentence_dedup(df).toPandas().set_index("doc_id")
    assert (w3["removed_sentences_n"] == 0).all()
    w2 = c4_sentence_dedup(df, window=2).toPandas().set_index("doc_id")
    assert w2.loc[1, "removed_sentences_n"] == 0
    assert w2.loc[2, "text_deduped"] == "Fresh opening of doc two."
    assert w2.loc[2, "removed_sentences_n"] == 2


def test_score_buckets_terciles_groups_and_nulls(spark):
    """CCNet tiering (quality_buckets.score_buckets): per-group exact
    terciles put the lowest third in 'head' (CCNet orientation: lower
    perplexity = better); a NULL group is its OWN group (null-safe
    join); NULL scores get NULL buckets; global mode (group_col=None)
    cuts the whole frame; custom labels/cuts respected."""
    from pcornet_data_curation_spark.operators.quality_buckets import score_buckets

    rows = [(i, "g" if i < 9 else None, float(i)) for i in range(1, 13)]
    rows.append((13, "g", None))
    df = spark.createDataFrame(rows, "doc_id int, grp string, score double")

    out = (
        score_buckets(df, "score", "grp", exact=True)
        .toPandas().set_index("doc_id").sort_index()
    )
    assert list(out.loc[1:8, "bucket"]) == ["head"] * 3 + ["middle"] * 2 + ["tail"] * 3
    # the NULL-group rows tier among themselves, not inside 'g'
    assert list(out.loc[9:12, "bucket"]) == ["head", "head", "middle", "tail"]
    assert out.loc[13, "bucket"] is None or out.loc[13, "bucket"] != out.loc[13, "bucket"]

    glob = (
        score_buckets(df, "score", None, exact=True, labels=("a", "b", "c"))
        .toPandas().set_index("doc_id").sort_index()
    )
    assert list(glob.loc[1:12, "bucket"]) == ["a"] * 4 + ["b"] * 4 + ["c"] * 4

    # quartiles via custom cuts; approx mode agrees with exact on a
    # frame far smaller than the sketch accuracy
    q = score_buckets(
        df.where("score IS NOT NULL"), "score", None,
        cuts=(0.25, 0.5, 0.75), labels=("q1", "q2", "q3", "q4"), exact=True,
    ).toPandas().set_index("doc_id").sort_index()
    assert list(q["bucket"]) == ["q1"] * 3 + ["q2"] * 3 + ["q3"] * 3 + ["q4"] * 3
    # approx mode (the 10^12-row default): approx_percentile returns a
    # DATA value rather than an interpolated one, so boundary rows may
    # differ from exact — assert the tiering is monotone in score and
    # all three tiers are used
    approx = (
        score_buckets(df, "score", "grp")  # default exact=False
        .toPandas().set_index("doc_id").sort_index()
    )
    ranks = {"head": 0, "middle": 1, "tail": 2}
    seq = [ranks[b] for b in approx.loc[1:8, "bucket"]]
    assert seq == sorted(seq) and set(seq) == {0, 1, 2}

    import pytest as _pytest
    with _pytest.raises(ValueError):
        score_buckets(df, "score", labels=("only", "two"), cuts=(0.1, 0.5, 0.9))


def test_gopher_repetition_matches_textcore_reference(spark):
    """The nine-rung Gopher repetition ladder (repetition.
    gopher_repetition) is pinned rung-by-rung to the pandas reference
    implementations the per-doc scoring path uses (functions/textcore
    dup_ngram_char_frac / top_ngram_char_frac) — including the
    pathological all-repeat doc where the Gopher top-gram fraction
    exceeds 1.0 (overlapping occurrences multiply), empty/NULL docs,
    and a doc shorter than every rung."""
    from pcornet_data_curation_spark.functions.textcore import (
        dup_ngram_char_frac,
        top_ngram_char_frac,
    )
    from pcornet_data_curation_spark.operators.repetition import gopher_repetition

    rows = [
        (1, "the cat sat on the mat the cat sat on the rug while the cat sat"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (3, "spam spam spam spam spam spam spam spam"),
        (4, ""),
        (5, None),
        (6, "one two three four five one two three four five one two six"),
        (7, "single"),
        # mixed case: 'The cat' != 'the cat' (textcore is case-aware)
        (8, "The cat the Cat the cat sat on The Cat the cat mat here"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = gopher_repetition(df).toPandas().set_index("doc_id").sort_index()
    assert len(out) == len(rows)
    for d, t in rows:
        toks = (t or "").split()  # textcore parity: case-preserving
        for n in (2, 3, 4):
            assert out.loc[d, f"top_{n}gram_char_frac"] == pytest.approx(
                top_ngram_char_frac(toks, n)
            ), (d, n)
        for n in (5, 6, 7, 8, 9, 10):
            assert out.loc[d, f"dup_{n}gram_char_frac"] == pytest.approx(
                dup_ngram_char_frac(toks, n)
            ), (d, n)
    # the all-repeat doc: overlapping top-gram occurrences multiply
    assert out.loc[3, "top_2gram_char_frac"] > 1.0
    assert out.loc[3, "dup_5gram_char_frac"] == 1.0


def test_c4_sentence_dedup_sentinel_and_window_guard(spark):
    """A pre-existing chr(30) byte in input text is stripped to a
    space before sentence splitting (it would otherwise act as a bogus
    boundary and mutate duplicate-free docs); window < 1 raises."""
    from pcornet_data_curation_spark.operators.c4 import c4_sentence_dedup

    df = spark.createDataFrame(
        [(1, "alpha\x1ebeta stays one sentence. second sentence here! third one too?")],
        "doc_id long, text string",
    )
    out = c4_sentence_dedup(df).toPandas().iloc[0]
    assert out["sentences_n"] == 3  # \x1e did NOT open a boundary
    assert out["text_deduped"] == (
        "alpha beta stays one sentence. second sentence here! third one too?"
    )
    with pytest.raises(ValueError):
        c4_sentence_dedup(df, window=0)


def test_language_mix_line_votes_vs_doc_vote(spark):
    """CCNet paragraph-langid signal (langmix.language_mix): a German
    line inside an English doc counts as a mismatch; unscorable
    ('und') lines are excluded from the fraction; all-foreign docs vote
    their own language with zero mismatch; NULL/empty docs are 'und'
    with zero lines."""
    from pcornet_data_curation_spark.operators.langmix import language_mix

    rows = [
        (1, "the cat and the dog of the house\n"
            "der hund und die katze der stadt\n"
            "the end of the story and more"),
        (2, "der hund und die katze\nder mann und die frau der stadt"),
        (3, "zz qq xx\n12345"),   # lines exist but none scorable
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = language_mix(df).toPandas().set_index("doc_id").sort_index()
    assert out.loc[1, "doc_lang"] == "en"
    assert out.loc[1, "lines_n"] == 3 and out.loc[1, "lines_scored_n"] == 3
    assert out.loc[1, "lines_mismatch_n"] == 1
    assert out.loc[1, "mix_frac"] == pytest.approx(1 / 3)
    assert out.loc[2, "doc_lang"] == "de" and out.loc[2, "lines_mismatch_n"] == 0
    assert out.loc[3, "doc_lang"] == "und"
    assert out.loc[3, "lines_n"] == 2 and out.loc[3, "lines_scored_n"] == 0
    assert out.loc[3, "mix_frac"] == 0.0
    for d in (4, 5):
        assert out.loc[d, "doc_lang"] == "und" and out.loc[d, "lines_n"] == 0
