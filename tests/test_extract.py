"""HTML → text extraction: block drops, entity decode order, header
vs head, binary input, and the roundtrip property the registry query
hash-checks (the north rule's 'byte-identical extracted text')."""


def test_extract_text_blocks_entities_and_binary(spark):
    from pcornet_data_curation_spark.operators.extract import extract_text

    rows = [
        (1, b"<html><head><title>T</title><meta x=1></head>"
            b"<body><p>Hello <b>world</b></p></body></html>"),
        (2, b"<body><script>var a = '<div>not text</div>';</script>"
            b"<SCRIPT src=x>1<2</SCRIPT><p>kept</p></body>"),
        (3, b"<body><style>p { color: red; }</style>styled text</body>"),
        (4, b"<body><!-- multi\nline\ncomment -->visible</body>"),
        (5, b"<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; x&nbsp;y</p>"),
        (6, b"<p>&amp;lt; stays literal</p>"),       # no double-decode
        (7, b"<body><header>site nav text</header><p>body</p></body>"),
        (8, None),
        (9, b"plain text, no tags at all"),
        (10, "<p>café — unicode</p>".encode("utf-8")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html binary")
    got = {r["doc_id"]: r["text_extracted"] for r in extract_text(df).collect()}

    assert got[1] == "Hello world"                 # head (title/meta) dropped
    assert got[2] == "kept"                        # scripts incl. raw </> dropped
    assert got[3] == "styled text"
    assert got[4] == "visible"
    assert got[5] == 'a & b <tag> "q" \'s\' x y'   # full entity table
    assert got[6] == "&lt; stays literal"          # &amp; decodes LAST
    assert got[7] == "site nav text body"          # <header> is TEXT, not <head>
    assert got[8] is None
    assert got[9] == "plain text, no tags at all"
    assert got[10] == "café — unicode"


def test_extract_roundtrip_flag_is_true(spark):
    """The registry query's roundtrip flag must actually be TRUE on
    real documents — a both-engines-equally-wrong extractor would
    still hash-match, so this pins the semantic."""
    from pcornet_data_curation_spark import queries as Q

    df = Q.q_extract_text(spark, "/root/testdata/sf0.001").toPandas()
    assert len(df) == 500 and bool(df["roundtrip"].all())


def test_extract_text_lines_block_boundaries(spark):
    """Newline-preserving chain: block tags become line boundaries,
    markup (source) newlines do NOT, blank-line runs collapse, inline
    tags stay inline."""
    from pcornet_data_curation_spark.operators.extract import (
        extract_text_lines_col,
    )
    from pyspark.sql import functions as F

    rows = [
        # two paragraphs + list: real line structure
        (1, b"<html><head><title>T</title></head><body>"
            b"<p>para one</p>\n\n<p>para two</p>"
            b"<ul><li>item a</li><li>item b</li></ul></body></html>"),
        # markup newlines inside a paragraph are plain whitespace
        (2, b"<p>one\nsingle\nparagraph</p>"),
        # <br> breaks a line; inline <b> does not
        (3, b"<p>first<br>second <b>bold</b> tail</p>"),
        # empty blocks between content collapse to one boundary
        (4, b"<div>a</div><div></div><div>  </div><div>b</div>"),
        # <param>/<progress>-style names must NOT match the p/pre tags
        (5, b"<p>x <param name=v> y <progress max=9>1</progress> z</p>"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html binary")
    got = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", extract_text_lines_col(F.col("html")).alias("t")
        ).collect()
    }
    assert got[1] == "para one\npara two\nitem a\nitem b"
    assert got[2] == "one single paragraph"
    assert got[3] == "first\nsecond bold tail"
    assert got[4] == "a\nb"
    assert got[5] == "x y 1 z"
    assert got[6] is None


def test_extract_lines_feed_line_signals(spark):
    """The verdict-r4 design gap, closed: text filled from html via
    preserve_lines carries >1 line into dup_line_metrics — a repeated
    paragraph is visible as a duplicated LINE, where the flat chain
    collapses the whole doc to one line and the signal degrades to
    whole-doc granularity."""
    from pcornet_data_curation_spark.operators.extract import (
        missing_text_filled_col,
    )
    from pcornet_data_curation_spark.operators.textanalysis import (
        dup_line_metrics,
    )
    from pyspark.sql import functions as F

    html = (
        "<body><p>unique opening line</p>"
        "<p>repeated boilerplate line</p>"
        "<p>repeated boilerplate line</p>"
        "<p>unique closing line</p></body>"
    ).encode()
    df = spark.createDataFrame(
        [(1, html, None)], "doc_id long, html binary, text string"
    )
    filled_lines = df.select(
        "doc_id", missing_text_filled_col(preserve_lines=True).alias("text")
    )
    row = dup_line_metrics(filled_lines).collect()[0]
    assert row["lines_n"] == 4 and row["distinct_lines_n"] == 3
    assert row["dup_line_frac"] > 0

    flat = df.select(
        "doc_id", missing_text_filled_col(preserve_lines=False).alias("text")
    )
    row0 = dup_line_metrics(flat).collect()[0]
    assert row0["lines_n"] == 1 and row0["dup_line_frac"] == 0.0
