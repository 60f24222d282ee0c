"""Multimodal plumbing: schemas, batch shapes, null handling
(decode itself is stubbed — no media libs in this container)."""

from pcornet_data_curation_spark.datagen.pages import pages_df
from pcornet_data_curation_spark.operators.multimodal import (
    frame_sample,
    image_metadata,
)
from pyspark.sql import functions as F


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
    nulls = out[~out.decode_ok]
    assert (nulls["n_bytes"] == 0).all()
    ok = out[out.decode_ok]
    assert (ok["format"] == "html").all() and (ok["width"] >= 64).all()


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
