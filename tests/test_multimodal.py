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


# ---- audio: real WAV-RIFF and MP3 frame-header fixtures ----------------

def wav_bytes(sample_rate=44100, channels=2, bits=16, seconds=1.5, junk_chunk=True):
    """A structurally-valid RIFF/WAVE header with a fmt chunk, an
    optional unknown chunk (the walker must skip it), and a data chunk
    sized for `seconds` of audio (payload itself truncated — header
    parsing never reads it)."""
    byte_rate = sample_rate * channels * bits // 8
    block_align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits
    )
    data_size = int(byte_rate * seconds)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if junk_chunk:
        chunks += b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded
    chunks += b"data" + struct.pack("<I", data_size) + b"\x00" * 16
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def mp3_bytes(version="v1", bitrate_kbps=128, sample_rate=44100, mono=False,
              id3=True, payload_len=4000, footer=False, xing_frames=None):
    """An MP3 with an optional ID3v2 tag (optionally footer-flagged,
    ID3v2.4 §3.1 bit 4 of the flags byte) followed by a real MPEG
    Layer III frame header encoding the requested parameters,
    optionally carrying a Xing VBR header with a frame count."""
    rate_idx = {44100: 0, 48000: 1, 32000: 2, 22050: 0, 24000: 1, 16000: 2}[sample_rate]
    if version == "v1":
        ver_bits, table = 0b11, [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
    else:
        ver_bits, table = 0b10, [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
    br_idx = table.index(bitrate_kbps)
    b1 = 0xFF
    b2 = 0xE0 | (ver_bits << 3) | (0b01 << 1) | 1  # Layer III, no CRC
    b3 = (br_idx << 4) | (rate_idx << 2)
    b4 = (0b11 if mono else 0b01) << 6
    body = b"\x00" * (payload_len - 4)
    if xing_frames is not None:
        # Xing sits after the side info: MPEG1 32 B stereo / 17 B mono,
        # MPEG2 17 / 9
        if version == "v1":
            side = 17 if mono else 32
        else:
            side = 9 if mono else 17
        xing = b"\x00" * side + b"Xing" + (1).to_bytes(4, "big") + int(
            xing_frames
        ).to_bytes(4, "big")
        body = xing + b"\x00" * (payload_len - 4 - len(xing))
    frame = bytes([b1, b2, b3, b4]) + body
    if not id3:
        return frame
    tag_body_len = 100
    sync = bytes([(tag_body_len >> 21) & 0x7F, (tag_body_len >> 14) & 0x7F,
                  (tag_body_len >> 7) & 0x7F, tag_body_len & 0x7F])
    flags = 0x10 if footer else 0x00
    tag = b"ID3\x04\x00" + bytes([flags]) + sync + b"\x00" * tag_body_len
    if footer:
        tag += b"3DI\x04\x00" + bytes([flags]) + sync  # 10-byte footer
    return tag + frame


def test_decode_real_audio_headers():
    from pcornet_data_curation_spark.operators.multimodal import decode_audio_meta

    m = decode_audio_meta(wav_bytes(sample_rate=44100, channels=2, bits=16, seconds=1.5))
    assert (m["format"], m["sample_rate"], m["channels"], m["bits_per_sample"],
            m["decode_ok"]) == ("wav", 44100, 2, 16, True)
    assert m["duration_sec"] == pytest.approx(1.5, rel=1e-3)
    assert m["bitrate_kbps"] == 44100 * 2 * 16 // 8 * 8 // 1000  # 1411

    m = decode_audio_meta(wav_bytes(sample_rate=8000, channels=1, bits=8, seconds=10))
    assert (m["sample_rate"], m["channels"], m["bits_per_sample"]) == (8000, 1, 8)
    assert m["duration_sec"] == pytest.approx(10.0, rel=1e-3)

    m = decode_audio_meta(mp3_bytes(version="v1", bitrate_kbps=128,
                                    sample_rate=44100, payload_len=16000))
    assert (m["format"], m["sample_rate"], m["channels"], m["bitrate_kbps"],
            m["decode_ok"]) == ("mp3", 44100, 2, 128, True)
    assert m["duration_sec"] == pytest.approx(16000 * 8 / 128000, rel=1e-3)

    m = decode_audio_meta(mp3_bytes(version="v2", bitrate_kbps=64,
                                    sample_rate=22050, mono=True, id3=False))
    assert (m["sample_rate"], m["channels"], m["bitrate_kbps"]) == (22050, 1, 64)


def test_decode_mp3_id3v24_footer(sample_rate=44100):
    """ADVICE r3: a footer-flagged ID3v2.4 tag puts the first frame 10
    bytes past the synchsafe size; decode must still parse it."""
    from pcornet_data_curation_spark.operators.multimodal import decode_audio_meta

    m = decode_audio_meta(mp3_bytes(version="v1", bitrate_kbps=128,
                                    sample_rate=sample_rate, footer=True))
    assert (m["format"], m["sample_rate"], m["bitrate_kbps"], m["decode_ok"]) == (
        "mp3", sample_rate, 128, True)


def test_decode_mp3_vbr_xing_duration():
    """Task r3#9: a Xing frame-count header overrides the CBR duration
    estimate — 1000 MPEG1 Layer III frames at 44.1 kHz is 1000×1152/
    44100 ≈ 26.12 s regardless of the first frame's nominal bitrate,
    and the reported bitrate becomes the measured average."""
    import pytest as _pytest

    from pcornet_data_curation_spark.operators.multimodal import decode_audio_meta

    raw = mp3_bytes(version="v1", bitrate_kbps=128, sample_rate=44100,
                    payload_len=16000, xing_frames=1000)
    m = decode_audio_meta(raw)
    assert m["decode_ok"]
    assert m["duration_sec"] == _pytest.approx(1000 * 1152 / 44100, rel=1e-6)
    assert m["bitrate_kbps"] == round(16000 * 8 / (1000 * 1152 / 44100) / 1000)
    # mono MPEG2: 9-byte side info, 576 samples/frame
    raw = mp3_bytes(version="v2", bitrate_kbps=64, sample_rate=22050,
                    mono=True, id3=False, xing_frames=500)
    m = decode_audio_meta(raw)
    assert m["duration_sec"] == _pytest.approx(500 * 576 / 22050, rel=1e-6)
    # Info (CBR) tag without frame-count flag → CBR estimate retained
    raw = bytearray(mp3_bytes(version="v1", bitrate_kbps=128, sample_rate=44100,
                              payload_len=16000, xing_frames=7))
    i = raw.index(b"Xing")
    raw[i:i + 8] = b"Info" + (0).to_bytes(4, "big")
    m = decode_audio_meta(bytes(raw))
    assert m["duration_sec"] == _pytest.approx(16000 * 8 / 128000, rel=1e-6)


def test_decode_non_audio_and_truncated():
    from pcornet_data_curation_spark.operators.multimodal import decode_audio_meta

    for payload in [
        b"RIFF\x00\x00\x00\x00AVI ",          # RIFF but not WAVE
        wav_bytes()[:11],                      # truncated before WAVE tag
        b"ID3\x04\x00\x00\x7f\x7f\x7f\x7f",    # ID3 tag, no frame after
        b"\xff\xf9\x00\x00",                   # sync but bad bitrate index (0)
        b"\xff\xeb\x10\x00",                   # reserved version bits (01)
        png_bytes(4, 4),                       # an image, not audio
        b"",
    ]:
        m = decode_audio_meta(payload)
        assert not m["decode_ok"] and m["sample_rate"] is None, payload[:8]
    with pytest.raises(NotImplementedError):
        decode_audio_meta(b"garbage", strict=True)


def test_audio_metadata_through_spark(spark):
    from pcornet_data_curation_spark.operators.multimodal import audio_metadata

    rows = [
        (1, bytearray(wav_bytes(sample_rate=16000, channels=1, bits=16, seconds=2.0))),
        (2, bytearray(mp3_bytes(version="v1", bitrate_kbps=192, sample_rate=48000))),
        (3, None),
        (4, bytearray(b"<html>nope</html>")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html binary")
    out = audio_metadata(df).toPandas().set_index("doc_id").sort_index()
    assert out.loc[1, ["format", "sample_rate", "channels", "bits_per_sample"]].tolist() == [
        "wav", 16000, 1, 16]
    assert out.loc[1, "duration_sec"] == pytest.approx(2.0, rel=1e-3)
    assert out.loc[2, ["format", "sample_rate", "bitrate_kbps"]].tolist() == [
        "mp3", 48000, 192]
    assert not out.loc[3, "decode_ok"] and out.loc[3, "n_bytes"] == 0
    assert out.loc[4, "format"] == "bin" and not out.loc[4, "decode_ok"]
    # schema is the declared DDL: nullable ints stay ints, not floats
    sch = dict(audio_metadata(df).dtypes)
    assert sch["sample_rate"] == "int" and sch["duration_sec"] == "double"
