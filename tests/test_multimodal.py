"""Multimodal plumbing: schemas, batch shapes, null handling, and the
REAL pure-Python header decode (PNG IHDR / JPEG SOF / GIF descriptor).
Full pixel decode still needs media libs absent from this container."""

import struct

import pytest
from pyspark.sql import functions as F

from pcornet_data_curation_spark.datagen.pages import pages_df
from pcornet_data_curation_spark.operators.multimodal import (
    decode_image_meta,
    frame_sample,
    image_metadata,
)


def png_bytes(w, h):
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + b"\x00\x00\x00\x00"
    )


def jpeg_bytes(w, h, extra_segments=True):
    out = b"\xff\xd8"  # SOI
    if extra_segments:
        app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
        out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        out += b"\xff\xfe" + struct.pack(">H", 9) + b"comment"  # COM
    sof = b"\x08" + struct.pack(">HH", h, w) + b"\x03"
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    return out


def gif_bytes(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def test_decode_real_image_headers():
    for payload, fmt, w, h in [
        (png_bytes(123, 45), "png", 123, 45),
        (png_bytes(1920, 1080), "png", 1920, 1080),
        (jpeg_bytes(640, 480), "jpeg", 640, 480),
        (jpeg_bytes(8000, 6000, extra_segments=False), "jpeg", 8000, 6000),
        (gif_bytes(320, 200), "gif", 320, 200),
    ]:
        m = decode_image_meta(payload)
        assert (m["format"], m["width"], m["height"], m["decode_ok"]) == (
            fmt, w, h, True,
        ), fmt


def test_decode_non_images_and_truncated():
    html = decode_image_meta(b"<html><body>hi</body></html>")
    assert html["format"] == "html" and not html["decode_ok"]
    assert html["width"] is None and html["n_bytes"] > 0
    assert decode_image_meta(b"\x00\x01garbage")["format"] == "bin"
    # truncated PNG header: sniffed as png but dims unparseable
    trunc = decode_image_meta(b"\x89PNG\r\n\x1a\n\x00\x00")
    assert trunc["format"] == "png" and not trunc["decode_ok"]
    assert decode_image_meta(None)["decode_ok"] is False
    with pytest.raises(NotImplementedError):
        decode_image_meta(b"<html>x</html>", strict=True)


def _pages_with_id(spark, n=120):
    return pages_df(spark, n, partitions=3).withColumn(
        "doc_id", F.xxhash64("url")
    )


def test_image_metadata_schema_and_nulls(spark):
    df = _pages_with_id(spark)
    meta = image_metadata(df, bin_col="html", id_col="doc_id")
    out = meta.toPandas()
    assert list(out.columns) == ["doc_id", "n_bytes", "format", "width", "height", "decode_ok"]
    assert len(out) == df.count()  # 1:1, including null payloads
    # the pages fixture stores html payloads — sniffed but not images,
    # so decode_ok is honestly False and dims NULL (no fakes)
    assert not out["decode_ok"].any()
    assert out["width"].isna().all()
    with_payload = out[out["n_bytes"] > 0]
    assert len(with_payload) > 0 and set(with_payload["format"]) <= {"html", "bin"}


def test_image_metadata_real_images_through_spark(spark):
    rows = [
        (1, bytearray(png_bytes(123, 45))),
        (2, bytearray(jpeg_bytes(640, 480))),
        (3, bytearray(gif_bytes(320, 200))),
        (4, None),
        (5, bytearray(b"<html>nope</html>")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html binary")
    out = (
        image_metadata(df).toPandas().set_index("doc_id").sort_index()
    )
    assert out.loc[1, ["format", "width", "height"]].tolist() == ["png", 123, 45]
    assert out.loc[2, ["format", "width", "height"]].tolist() == ["jpeg", 640, 480]
    assert out.loc[3, ["format", "width", "height"]].tolist() == ["gif", 320, 200]
    assert not out.loc[4, "decode_ok"] and out.loc[4, "n_bytes"] == 0
    assert out.loc[5, "format"] == "html" and not out.loc[5, "decode_ok"]


def test_image_metadata_deterministic(spark):
    df = _pages_with_id(spark)
    a = image_metadata(df).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = image_metadata(df).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_frame_sample_fanout(spark):
    df = _pages_with_id(spark)
    frames = frame_sample(df, n_frames=4).toPandas()
    n_payload = df.where(F.col("html").isNotNull()).count()
    assert len(frames) == 4 * n_payload
    assert set(frames["frame_idx"]) == {0, 1, 2, 3}
