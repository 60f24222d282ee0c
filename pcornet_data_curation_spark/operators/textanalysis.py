"""Text-analysis operators over a documents table — JVM-first.

Unlike the scoring UDF (which needs numpy models), these are the
cheap per-document text metrics expressed entirely in Column algebra
so they stay inside whole-stage codegen AND have exact ANSI-SQL
oracles (DuckDB) for the driver's correctness gate:

* token_count / char metrics
* quality_score   — length/punct/stopword-ratio heuristic score
* langid_heuristic — stopword-marker language guess (en/de/fr/es)
* fingerprint     — whitespace-normalized content hash (xxhash64;
  rows-only oracle since the hash fn is Spark-specific)

The ASCII whitespace class matches functions.textcore.WS_RE.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WS = "[ \\t\\n\\r\\f\\x0B]+"


def _tokens(col):
    return F.split(F.trim(F.regexp_replace(col, WS, " ")), " ")


def word_kgram_col(toks, n, k: int):
    """Array of space-joined word k-grams, built by k-1 zip_with passes
    over shifted views of the token array instead of one slice +
    concat_ws per POSITION (the naive transform(sequence, slice)
    shape): measured 5× faster at k=3, 2.3× at k=8 on the sf0.1
    documents table, byte-identical output. zip_with pads the shorter
    side with null and concat_ws drops nulls, so the trailing
    partial grams are cut by the final slice to n-k+1 entries.
    Caller guards n >= k."""
    out = toks
    for j in range(1, k):
        out = F.zip_with(
            out,
            F.slice(toks, j + 1, F.greatest(n - j, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.slice(out, 1, F.greatest(n - k + 1, F.lit(0)))


def token_count(col):
    """Whitespace token count; 0 for empty/null-as-empty strings."""
    t = F.trim(F.regexp_replace(col, WS, " "))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, " ")))


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    toks = token_count(c)
    return df.withColumn("n_chars_sql", F.length(c)).withColumn("n_tokens_sql", toks)


def vocab_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 1000,
    min_doc_freq: int = 1,
    lowercase: bool = True,
) -> DataFrame:
    """Corpus vocabulary statistics — (token, term_freq, doc_freq) for
    the top_n tokens by frequency: the input a tokenizer-training /
    stopword-induction / corpus-drift stage reads (term_freq drives
    BPE merges and vocab selection; doc_freq separates ubiquitous
    glue words from hot-in-few-docs boilerplate). Tokens are
    whitespace tokens of the normalized text (lowercased by default;
    pass lowercase=False for a case-sensitive vocabulary). Output is
    totally ordered by (term_freq desc, token) so the top_n cut is
    deterministic.

    Scale shape: explode → TWO-LEVEL aggregation. Level 1 groups by
    (token, doc) — its map-side partial agg collapses within-doc
    repeats before the only corpus-sized exchange, and doc_freq then
    falls out as a plain count (never a countDistinct over raw token
    rows, whose partial state IS the distinct pair set). Level 2
    groups by token over the already-(token,doc)-distinct rows, where
    hot tokens ('the' in every English doc) collapse map-side again.
    The final top_n is a TakeOrderedAndProject (no global sort). The
    shuffled rows are (token, doc-id/count) pairs — the text payload
    never moves."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    if lowercase:
        c = F.lower(c)
    exploded = df.select(
        F.col(id_col).alias("_id"), F.explode(_tokens(c)).alias("token")
    ).where(F.col("token") != "")
    per_doc = exploded.groupBy("token", "_id").agg(
        F.count(F.lit(1)).alias("_tf_doc")
    )
    out = per_doc.groupBy("token").agg(
        F.sum("_tf_doc").alias("term_freq"),
        F.count(F.lit(1)).alias("doc_freq"),
    )
    if min_doc_freq > 1:
        out = out.where(F.col("doc_freq") >= min_doc_freq)
    return out.orderBy(F.col("term_freq").desc(), "token").limit(top_n)


_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "los", "que"],
}


def _marker_pad(col):
    """The marker-count padding: ' ' + ws-normalized lowercase + ' '.
    Hot paths stage this as an attribute so the per-word splits read
    row data instead of re-inlining the regexp per reference
    (langmix.language_mix; langid_heuristic stages the hit columns)."""
    return F.concat(F.lit(" "), F.regexp_replace(F.lower(col), WS, " "), F.lit(" "))


def _marker_hits_from_pad(pad, words: list[str]):
    """Split-count arithmetic over an already-padded column/attribute:
    size(split(pad, ' w ', -1)) - 1 summed over the word list."""
    total = F.lit(0)
    for w in words:
        total = total + F.size(F.split(pad, f" {w} ", -1)) - 1
    return total


def _marker_hits(col, words: list[str]):
    """Occurrences of whole-word markers in the lowercased text —
    counted by padding + split arithmetic (size(split(x, ' w ')) - 1),
    which has an exact SQL equivalent. Single-Column convenience form
    of _marker_hits_from_pad(_marker_pad(col), words)."""
    return _marker_hits_from_pad(_marker_pad(col), words)


def langid_heuristic(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-marker language vote: argmax over per-language marker
    hit counts; 'und' when all zero. Exactly SQL-expressible (the
    split-count trick undercounts adjacent repeats identically in both
    engines, so parity holds)."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    hits = {lang: _marker_hits(c, ws).alias(f"hits_{lang}") for lang, ws in _MARKERS.items()}
    scored = df.select(F.col(id_col), *hits.values())
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in _MARKERS])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in _MARKERS:  # first-wins tie break in fixed order
        pred = pred.when(F.col(f"hits_{lang}") == best, F.lit(lang))
    return scored.select(
        id_col,
        *[f"hits_{lang}" for lang in _MARKERS],
        pred.alias("lang_guess"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Composite quality score in [0,1]: length band + terminal-punct
    density + stopword presence, all Column algebra with a SQL oracle."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    n_tok = token_count(c).cast("double")
    n_chars = F.length(c).cast("double")
    sent_marks = (
        F.size(F.split(c, "\\.", -1)) - 1 + F.size(F.split(c, "!", -1)) - 1 + F.size(F.split(c, "\\?", -1)) - 1
    ).cast("double")
    stop_hits = _marker_hits(c, _MARKERS["en"]).cast("double")
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    sent_score = F.least(sent_marks / F.greatest(n_tok / F.lit(20.0), F.lit(1.0)), F.lit(1.0))
    stop_score = F.least(stop_hits / F.greatest(n_tok / F.lit(10.0), F.lit(1.0)), F.lit(1.0))
    # raw double (no F.round): the identical IEEE expression tree is
    # replayed by the SQL oracle, and Spark round() is not cross-engine
    # reproducible (decimal-string HALF_UP vs binary rounding)
    score = (len_score + sent_score + stop_score) / F.lit(3.0)
    return df.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        n_chars.cast("long").alias("n_chars"),
        score.alias("quality"),
    )


# GPT-2-style pre-tokenizer, restricted to the Java∩RE2 dialect (no
# lookarounds, explicit ASCII classes): contractions, optional-space
# letter runs, digit runs, symbol runs, whitespace runs. Token count =
# number of matches — the BPE-ish budget estimate for LLM training data.
BPE_ISH_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?[A-Za-z]+"
    r"| ?[0-9]+"
    r"| ?[^A-Za-z0-9 \t\n\r\f\x0B]+"
    r"|[ \t\n\r\f\x0B]+"
)


def bpe_token_count(col):
    """Number of BPE-ish pre-tokenizer matches (JVM regexp_extract_all,
    exact SQL twin via DuckDB regexp_extract_all)."""
    return F.size(F.regexp_extract_all(F.coalesce(col, F.lit("")), F.lit(BPE_ISH_PATTERN), F.lit(0)))


def with_bpe_token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(F.col(id_col), bpe_token_count(F.col(text_col)).alias("bpe_tokens"))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace/case-normalized 64-bit content fingerprint — exact-dup
    detection robust to formatting (xxhash64: Spark-side only)."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), WS, " ")))
    return df.select(F.col(id_col), F.xxhash64(norm).alias("fingerprint"))


def dup_line_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style duplicate-line repetition signal, pure Column
    algebra: per document, the fraction of line characters belonging to
    lines that occur more than once (boilerplate/nav repetition —
    north-star 'repetition n-gram dedup signals' family).

    All array higher-order functions — no explode, no shuffle: for each
    distinct non-blank trimmed line, its occurrence count is
    size(filter(lines, = d)); O(distinct_lines × lines) per document
    inside codegen, zero exchanges for the per-doc metric (the oracle
    runs the same set algebra in SQL with UNNEST + GROUP BY).
    """
    c = F.coalesce(F.col(text_col), F.lit(""))  # NULL text → no lines, not NULL arrays
    lines = F.filter(
        F.transform(F.split(c, "\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    distinct = F.array_distinct(lines)
    occ = lambda d: F.size(F.filter(lines, lambda x: x == d))  # noqa: E731
    dup_chars = F.aggregate(
        distinct,
        F.lit(0).cast("long"),
        lambda acc, d: acc
        + F.when(occ(d) > 1, F.length(d).cast("long") * occ(d)).otherwise(F.lit(0).cast("long")),
    )
    total_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x).cast("long")
    )
    frac = F.when(total_chars > 0, dup_chars / total_chars).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        F.size(lines).alias("lines_n"),
        F.size(distinct).alias("distinct_lines_n"),
        dup_chars.alias("dup_line_chars"),
        total_chars.alias("line_chars"),
        frac.alias("dup_line_frac"),
    )


def dup_line_metrics_exploded(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """LINEAR twin of dup_line_metrics for long-document corpora: the
    array-HOF default is O(distinct_lines × lines) per document inside
    codegen (fine for web pages, quadratic for a pathological 20k-line
    doc), so this variant explodes to (doc_id, line) rows and counts
    occurrences with one groupBy — O(lines) work at the cost of a
    doc-keyed shuffle. Output is row/value-identical to
    dup_line_metrics (pytest-pinned + same SQL oracle)."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(
        F.transform(F.split(c, "\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    base = df.select(F.col(id_col).alias("_id"), lines.alias("lines"))
    per_line = (
        base.select("_id", F.explode("lines").alias("line"))
        .groupBy("_id", "line")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    per_doc = per_line.groupBy("_id").agg(
        F.sum("occ").alias("lines_n"),
        F.count(F.lit(1)).alias("distinct_lines_n"),
        F.sum(
            F.when(F.col("occ") > 1, F.length("line").cast("long") * F.col("occ"))
            .otherwise(F.lit(0).cast("long"))
        ).alias("dup_line_chars"),
        F.sum(F.length("line").cast("long") * F.col("occ")).alias("line_chars"),
    )
    ids = base.select("_id")
    out = ids.join(per_doc, "_id", "left").na.fill(
        {"lines_n": 0, "distinct_lines_n": 0, "dup_line_chars": 0, "line_chars": 0}
    )
    frac = F.when(
        F.col("line_chars") > 0, F.col("dup_line_chars") / F.col("line_chars")
    ).otherwise(F.lit(0.0))
    return out.select(
        F.col("_id").alias(id_col),
        F.col("lines_n").cast("int").alias("lines_n"),
        F.col("distinct_lines_n").cast("int").alias("distinct_lines_n"),
        "dup_line_chars",
        "line_chars",
        frac.alias("dup_line_frac"),
    )


def dup_line_metrics_auto(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hof_lines: int = 4096,
) -> DataFrame:
    """Dispatch wrapper: docs with ≤ max_hof_lines lines take the
    zero-shuffle array-HOF path; longer docs take the linear
    explode+groupBy twin. Closes the pathological case (a 20k-line doc
    is 4×10⁸ comparisons in one task under the HOF default; the
    exploded path is O(lines)) while keeping the common web page —
    tens to hundreds of lines — shuffle-free. The two branches are
    value-identical (pytest-pinned), so the union is a pure routing
    decision; the line-count predicate is a cheap O(len) split that
    both branches recompute anyway."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    lines_n = F.size(
        F.filter(F.transform(F.split(c, "\n"), lambda s: F.trim(s)), lambda s: s != "")
    )
    small = dup_line_metrics(df.where(lines_n <= max_hof_lines), text_col, id_col)
    large = dup_line_metrics_exploded(df.where(lines_n > max_hof_lines), text_col, id_col)
    return small.unionByName(large)


def nfc_normalize_text(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Unicode NFC normalization (UAX #15) — the canonical-composition
    step most training pipelines apply before tokenization so that
    'café' composed and decomposed hash/dedup identically. Spark has no
    built-in normalizer, so this is an Arrow-batched pandas UDF around
    unicodedata (one of the few justified Python text ops); DuckDB's
    nfc_normalize implements the same UAX #15 mapping, verified
    equal on composed/decomposed/compatibility cases, so the op is
    fully value-hash oracle-checked."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    return df.select(F.col(id_col), _nfc(F.col(text_col)).alias("text_nfc"))


def compression_ratio(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", level: int = 6
) -> DataFrame:
    """DEFLATE compression ratio per document — the CCNet/Dolma-style
    quality signal: highly compressible text (ratio ≪ 1) is
    repetitive/templated boilerplate, near-incompressible text
    (ratio → 1+) is noise/binary-ish. Complements the exact repetition
    signals (dup lines, top-gram, span dedup) with a single holistic
    scalar that catches repetition those n-gram windows miss.

    ratio = len(zlib.compress(utf8, level)) / len(utf8); NULL for
    empty/NULL docs (no bytes to compress — mirrors the cont-stats
    NULL convention). Arrow-batched pandas UDF (zlib is C-speed;
    justified Python like the NFC normalizer). Deterministic for a
    fixed level and zlib build — the pytest twin pins exact values —
    but zlib output is not expressible in DuckDB SQL, so the registry
    entry is declared rows-only (the honest evidence class; same as
    the xxhash64 fingerprint residue)."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    lvl = int(level)

    @pandas_udf("struct<n_bytes: long, compressed_bytes: long>")
    def _comp(texts: pd.Series) -> pd.DataFrame:
        def one(t):
            if t is None:
                return (0, 0)
            b = t.encode("utf-8")
            if not b:
                return (0, 0)
            return (len(b), len(zlib.compress(b, lvl)))

        pairs = texts.map(one)
        return pd.DataFrame(
            {
                "n_bytes": pairs.map(lambda p: p[0]),
                "compressed_bytes": pairs.map(lambda p: p[1]),
            }
        )

    # evaluate the UDF ONCE per row (explicit intermediate projection
    # rather than three struct-field references to the same call)
    mid = df.select(F.col(id_col), _comp(F.col(text_col)).alias("_c"))
    ratio = F.when(
        F.col("_c.n_bytes") > 0, F.col("_c.compressed_bytes") / F.col("_c.n_bytes")
    )  # else NULL
    return mid.select(
        F.col(id_col),
        F.col("_c.n_bytes").alias("n_bytes"),
        F.col("_c.compressed_bytes").alias("compressed_bytes"),
        ratio.alias("compression_ratio"),
    )


def topgram_repetition(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 2
) -> DataFrame:
    """Gopher-style top-n-gram repetition: per document, the most
    frequent word k-gram and the fraction of the document's characters
    covered by its occurrences (count × gram length / normalized text
    length) — the in-document repetition signal Gopher thresholds at
    0.20 for 2-grams (Rae et al. 2021, table A1).

    Shape (round 6): the signal is strictly per-document, so it is ONE
    mapInPandas pass over (id, text) — no explode, no doc-keyed
    aggregations, no join back, no shuffle: a map-only stage that
    pipelines into the scan at any scale (the former explode +
    two-aggregation + join shape re-evaluated the tokenize/shingle
    projection twice and shuffled every gram occurrence for purely
    within-doc state; measured 11 s → ~2 s at sf1.0). Ties break to
    the lexicographically-largest gram (Python tuple max == Spark
    max(struct(cnt, gram)) == UTF-8 byte order — all code-point
    orderings), so the result is deterministic and the SQL oracle
    (row_number over cnt desc, gram desc) reproduces it exactly.
    Lowercasing is Spark's F.lower applied in the projection BEFORE
    the Python pass, so unicode case mapping stays the JVM's — the
    oracle's lower() twin.
    """
    import re
    from collections import Counter

    from pyspark.sql import types as T

    ws_re = re.compile(WS)
    schema = T.StructType(
        [df.schema[id_col]]
        + [
            T.StructField("grams_n", T.LongType(), False),
            T.StructField("top_gram", T.StringType(), True),
            T.StructField("top_gram_n", T.LongType(), False),
            T.StructField("top_gram_char_frac", T.DoubleType(), False),
        ]
    )

    def compute(batches):
        for pdf in batches:
            grams_n, top_gram, top_gram_n, frac = [], [], [], []
            for t in pdf["_lt"]:
                t = t if isinstance(t, str) else ""
                norm = ws_re.sub(" ", t).strip(" ")
                toks = norm.split(" ") if norm else []
                m = len(toks)
                if m >= k:
                    cur = toks
                    for n in range(2, k + 1):
                        cur = [cur[i] + " " + toks[i + n - 1] for i in range(m - n + 1)]
                    cnt = Counter(cur)
                    tc, tg = max((c, g) for g, c in cnt.items())
                    chars = len(norm)
                    grams_n.append(len(cur))
                    top_gram.append(tg)
                    top_gram_n.append(tc)
                    frac.append(len(tg) * tc / chars if chars > 0 else 0.0)
                else:
                    grams_n.append(0)
                    top_gram.append(None)
                    top_gram_n.append(0)
                    frac.append(0.0)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "grams_n": pd.Series(grams_n, dtype="int64", index=pdf.index),
                    "top_gram": pd.Series(top_gram, dtype="object", index=pdf.index),
                    "top_gram_n": pd.Series(top_gram_n, dtype="int64", index=pdf.index),
                    "top_gram_char_frac": pd.Series(
                        frac, dtype="float64", index=pdf.index
                    ),
                }
            )

    # lowercase in the JVM projection (unicode case mapping parity with
    # the SQL oracle); the Python side only tokenizes and counts
    sel = df.select(
        F.col(id_col), F.lower(F.coalesce(F.col(text_col), F.lit(""))).alias("_lt")
    )
    return sel.mapInPandas(compute, schema)


def cross_doc_ngram_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8
) -> DataFrame:
    """Cross-document repeated-span signal (the exact-substring-dedup
    family of training-data pipelines — Lee et al.'s dedup reduced to
    its flaggable core): per document, how many of its distinct word
    k-grams also occur in at least one OTHER document, and the fraction
    of its k-grams that do.

    Plan shape for 10^12 docs: explode distinct k-gram hashes (the
    shuffle rows are (gram:long, doc:long)), TWO-PHASE document
    frequency — groupBy(gram).count() whose PARTIAL aggregation
    absorbs hot grams map-side (a boilerplate 8-gram in 10^9 docs
    reduces to one row per input partition before the exchange) —
    then an equi-join of the per-gram count back onto the exploded
    frame and one count per doc. The r2 Window.partitionBy(gram)
    shape saved an exchange but materialized each gram's rows in ONE
    task (WindowExec has no partial step): a 10^9-doc hot gram became
    a single-core 10^9-row sorted partition. Here the join's probe
    side is skew-splittable by AQE (the build side is one row per
    gram), so no single task ever owns a hot gram. Everything is
    keyed by gram/doc; no pair explosion, unlike the jaccard
    self-join. Oracle is the identical set algebra on the gram
    STRINGS (hash-independent, since only equality matters).
    """
    toks = _tokens(F.lower(F.col(text_col)))  # case-blind like the jaccard path
    n = F.size(toks)
    grams = F.when(
        n >= k,
        F.array_distinct(
            F.transform(word_kgram_col(toks, n, k), lambda s: F.xxhash64(s))
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    base = df.where(
        F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
    ).select(F.col(id_col).alias("_id"), grams.alias("grams"))
    # grams are per-doc DISTINCT, so a plain COUNT per gram IS the
    # document frequency; keep only the shared grams (df > 1) — that
    # projection is tiny relative to the exploded frame
    exploded = base.select("_id", F.explode("grams").alias("gram"))
    shared = (
        exploded.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") > 1)
        .select("gram")
    )
    per_doc = (
        exploded.join(shared, "gram")  # both sides partitioned on gram
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("shared_grams_n"))
    )
    totals = base.select("_id", F.size("grams").alias("grams_n"))
    out = totals.join(per_doc, "_id", "left").na.fill({"shared_grams_n": 0})
    frac = F.when(
        F.col("grams_n") > 0, F.col("shared_grams_n") / F.col("grams_n")
    ).otherwise(F.lit(0.0))
    return out.select(
        F.col("_id").alias(id_col),
        "grams_n",
        "shared_grams_n",
        frac.alias("shared_gram_frac"),
    )
