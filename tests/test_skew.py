"""Long-tail-domain skew handling (SURVEY §7 build item 7): 50% of the
synthetic pages hit 3 hot domains; the salted (bucket, salt) repartition
must still spread rows near-uniformly across partitions."""

import numpy as np
from pyspark.sql import functions as F

from pcornet_data_curation_spark.config import PipelineConfig
from pcornet_data_curation_spark.datagen.pages import pages_df
from pcornet_data_curation_spark.plans.pipeline import (
    bucket_col,
    salt_col,
    salted_repartition,
)


def test_hot_domains_exist(spark):
    pages = pages_df(spark, 4000, partitions=4)
    dom = pages.select(
        F.regexp_extract("url", r"https://([^/]+)/", 1).alias("d")
    ).groupBy("d").count()
    top = dom.orderBy(F.col("count").desc()).limit(3).agg(F.sum("count")).first()[0]
    assert top > 4000 * 0.4  # the long tail is real


def test_salted_repartition_balances(spark):
    cfg = PipelineConfig(output_root="/tmp/unused", n_buckets=8, salt_factor=4)
    pages = pages_df(spark, 4000, partitions=4)
    df = salted_repartition(pages, cfg)
    sizes = (
        df.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .toPandas()["count"]
        .to_numpy()
    )
    # url-hash keys ignore the domain entirely, so hot domains cannot
    # concentrate. Range partitioning guarantees ≤2 cells per partition
    # (a sampled boundary can merge two adjacent cells, never more), so
    # the worst task is bounded by ~2.2x the mean — vs ~4x under
    # hash-mod repartition (balls-into-bins collisions).
    assert sizes.max() <= 2.2 * sizes.mean()
    assert len(sizes) >= cfg.n_buckets * cfg.salt_factor * 0.8


def test_bucket_and_salt_are_independent_streams(spark):
    pages = pages_df(spark, 2000, partitions=2)
    both = (
        pages.select(bucket_col(8).alias("b"), salt_col(4).alias("s"))
        .groupBy("b", "s")
        .count()
        .toPandas()
    )
    # all 32 (bucket, salt) cells populated — salt actually subdivides
    assert len(both) == 32
    cv = np.std(both["count"]) / np.mean(both["count"])
    assert cv < 0.5
