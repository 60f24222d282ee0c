"""Multimodal column plumbing — image/audio/video as opaque binary.

The Spark-side machinery (schemas, Arrow batch shapes, mapInPandas
partitioning) is real and tested. Header-level decode (format sniff +
pixel dimensions for PNG / JPEG / GIF) is a REAL pure-Python parser —
no fakes; full pixel decode (and audio/video) still needs PIL/librosa/
ffmpeg, which don't exist in this container, so frame_sample remains a
clearly-marked deterministic stand-in for the batch shape a real
sampler would use.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

IMAGE_META_DDL = (
    "doc_id long, n_bytes int, format string, width int, height int, decode_ok boolean"
)
FRAME_SAMPLE_DDL = "doc_id long, frame_idx int, frame_hash long"

# JPEG start-of-frame markers carrying dimensions: SOF0-SOF15 minus
# DHT(C4)/JPG(C8)/DAC(CC), per ITU-T T.81 §B.2.2
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}
_JPEG_STANDALONE = set(range(0xD0, 0xDA)) | {0x01}  # RSTn, SOI/EOI, TEM


def _png_dims(b: bytes) -> tuple[int, int] | None:
    """PNG IHDR: 8-byte signature, then the IHDR chunk (4-byte length,
    'IHDR', width/height as big-endian uint32)."""
    if len(b) < 24 or b[12:16] != b"IHDR":
        return None
    w = int.from_bytes(b[16:20], "big")
    h = int.from_bytes(b[20:24], "big")
    return (w, h) if w > 0 and h > 0 else None


def _jpeg_dims(b: bytes) -> tuple[int, int] | None:
    """Walk JPEG marker segments to the first SOFn: payload is
    precision(1) + height(2 BE) + width(2 BE)."""
    i, n = 2, len(b)  # skip SOI
    while i + 3 < n:
        if b[i] != 0xFF:
            return None  # desynchronized
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in _JPEG_STANDALONE:
            i += 2
            continue
        seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
        if seg_len < 2:
            return None
        if marker in _JPEG_SOF:
            if i + 9 > n:
                return None
            h = int.from_bytes(b[i + 5 : i + 7], "big")
            w = int.from_bytes(b[i + 7 : i + 9], "big")
            return (w, h) if w > 0 and h > 0 else None
        i += 2 + seg_len
    return None


def _gif_dims(b: bytes) -> tuple[int, int] | None:
    """GIF logical screen descriptor: width/height as little-endian
    uint16 at offset 6."""
    if len(b) < 10:
        return None
    w = int.from_bytes(b[6:8], "little")
    h = int.from_bytes(b[8:10], "little")
    return (w, h) if w > 0 and h > 0 else None


def decode_image_meta(payload: bytes | None, strict: bool = False) -> dict:
    """Header-level image decode: format sniff by magic bytes plus REAL
    pixel dimensions parsed from the PNG IHDR chunk, the first JPEG
    SOFn segment, or the GIF screen descriptor (pure Python, no
    libraries). decode_ok=True only when dimensions were actually
    parsed. Non-image payloads (or truncated headers) → decode_ok=False
    with width/height NULL; strict=True raises on those instead."""
    if payload is None:
        return {"n_bytes": 0, "format": None, "width": None, "height": None, "decode_ok": False}
    dims = None
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        fmt, dims = "png", _png_dims(payload)
    elif payload[:2] == b"\xff\xd8":
        fmt, dims = "jpeg", _jpeg_dims(payload)
    elif payload[:6] in (b"GIF87a", b"GIF89a"):
        fmt, dims = "gif", _gif_dims(payload)
    elif payload[:5].lower() == b"<html" or payload[:9].lower() == b"<!doctype":
        fmt = "html"
    else:
        fmt = "bin"
    if dims is None:
        if strict:
            raise NotImplementedError(
                f"cannot parse dimensions from {fmt} payload (full decoders "
                "unavailable in this environment)"
            )
        return {
            "n_bytes": len(payload), "format": fmt,
            "width": None, "height": None, "decode_ok": False,
        }
    return {
        "n_bytes": len(payload), "format": fmt,
        "width": dims[0], "height": dims[1], "decode_ok": True,
    }


def image_metadata(df: DataFrame, bin_col: str = "html", id_col: str = "doc_id") -> DataFrame:
    """mapInPandas extractor: binary column → typed metadata rows.
    Arrow-batched; one Python pass per batch, never per row via
    row-UDF. Output schema is fixed (IMAGE_META_DDL) regardless of
    decode availability."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_image_meta(p) for p in pdf[bin_col]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf[id_col].to_numpy())
            out["n_bytes"] = out["n_bytes"].astype("int32")
            # nullable Int32: width/height are NULL when undecodable
            out["width"] = out["width"].astype("Int32")
            out["height"] = out["height"].astype("Int32")
            yield out[["doc_id", "n_bytes", "format", "width", "height", "decode_ok"]]

    return df.select(id_col, bin_col).mapInPandas(extract, IMAGE_META_DDL)


def frame_sample(
    df: DataFrame, bin_col: str = "html", id_col: str = "doc_id", n_frames: int = 4
) -> DataFrame:
    """Video-style frame sampling stub: emits n_frames deterministic
    'frame hashes' per non-null payload (1 input row → N output rows —
    the UDTF batch shape a real ffmpeg sampler would use)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[bin_col]):
                if payload is None:
                    continue
                base = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
                for f in range(n_frames):
                    rows.append(
                        (int(did), f, ((base * (f + 1)) % (1 << 63)) - (1 << 62))
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_hash"])

    return df.select(id_col, bin_col).mapInPandas(sample, FRAME_SAMPLE_DDL)
