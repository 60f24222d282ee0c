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
