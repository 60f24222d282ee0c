"""Multimodal column plumbing — image/audio/video as opaque binary.

The Spark-side machinery (schemas, Arrow batch shapes, mapInPandas
partitioning) is real and tested; the actual media decode is stubbed
because no image/audio libraries exist in this container. Each
extractor tries the real decoder import and otherwise produces a
deterministic fake (or raises NotImplementedError when
`strict=True`), so swapping in PIL/librosa later changes one
function, not the pipeline.
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


def _fake_dims(payload: bytes) -> tuple[int, int]:
    # deterministic fake: dims derived from content hash
    h = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    return 64 + (h % 1920), 64 + ((h >> 24) % 1080)


def decode_image_meta(payload: bytes | None, strict: bool = False) -> dict:
    """Stub decode: returns typed metadata. With PIL installed this
    would open the payload; here it sniffs magic bytes and fakes dims."""
    if payload is None:
        return {"n_bytes": 0, "format": None, "width": None, "height": None, "decode_ok": False}
    try:  # real decoder, if ever present
        from PIL import Image  # noqa: F401

        raise NotImplementedError("real PIL decode path not wired in this sandbox")
    except ImportError:
        pass
    if strict:
        raise NotImplementedError("no image decoder available in this environment")
    fmt = (
        "png"
        if payload[:8] == b"\x89PNG\r\n\x1a\n"
        else "jpeg"
        if payload[:2] == b"\xff\xd8"
        else "html"
        if payload[:5] == b"<html"
        else "bin"
    )
    w, h = _fake_dims(payload)
    return {"n_bytes": len(payload), "format": fmt, "width": w, "height": h, "decode_ok": True}


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
