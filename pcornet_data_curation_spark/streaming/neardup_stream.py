"""Streaming near-dedup: per-micro-batch MinHash banding against a
persisted signature STORE (flag-only) — the bounded-per-batch-state
recipe the r4 verdict asked for (curate_stream refuses
dedup_method='near' because the batch operator's corpus-wide self-join
has no unbounded-stream equivalent; this module is the operational
answer for streams).

Reference analog: the incremental append-accumulate discipline
(`proc append` result accumulation, data_curation_base.sas:699-701) —
each micro-batch's surviving signatures append to a durable store the
next batch probes.

Design (per micro-batch, inside foreachBatch):
1. signatures: the batch's MinHash signatures (operators/dedup.
   with_minhash — same permutations/seed as the batch operator, so a
   stream-flagged corpus agrees with a batch re-run) minus the
   shingle-less sentinel docs;
2. within-batch candidates: ids-only band self-join (the batch
   operator's exact shape at micro-batch size), signature-verified at
   `threshold`; the min id of each verified pair survives;
3. cross-batch candidates: ids-only band equi-join against the STORE's
   (id, band, bhash) rows, signature-verified against the store's
   (id, minhash) rows — any verified hit flags the new doc (the stored
   doc was emitted in an earlier batch and cannot be retro-flagged —
   first-seen survivor, the same documented divergence as
   stream_dedup_flag);
4. append ONLY the batch's surviving docs' band + signature rows to
   the store, under a batch={batch_id} partition written with
   overwrite — a foreachBatch replay after failure rewrites the same
   partition instead of duplicating it (idempotent, exactly-once).

State shape at 10^12 docs: per-batch memory is bounded by the batch;
the store is an on-disk, append-only, batch-partitioned parquet table
(bands: 3×8-byte columns × `bands` rows/doc; sigs: num_perm longs/doc)
— the same asset a batch LSH pass builds, never held in executor
memory (the probe is a plain equi-join the planner sizes from runtime
stats). Compact it offline (rewrite survivors-only) when batches
accumulate; est_jaccard verification keeps band-collision false
positives out regardless of store size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pcornet_data_curation_spark.functions import hashing as H
from pcornet_data_curation_spark.operators.dedup import with_minhash

BANDS_SUBDIR = "bands"
SIGS_SUBDIR = "sigs"


def _store_exists(spark: SparkSession, path: str) -> bool:
    """Existence check through the configured Hadoop FileSystem — the
    store lives on distributed storage in production (hdfs:// / s3a://)
    where a driver-local os.path.exists is always False and would
    silently disable cross-batch dedup (every batch would then flag
    within-batch only while still writing the store — no error
    anywhere). Resolving the path against the session's Hadoop conf
    covers local paths too."""
    jvm = spark._jvm
    hp = jvm.org.apache.hadoop.fs.Path(path)
    fs = hp.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hp))


def _band_rows(sigged: DataFrame, num_perm: int, bands: int) -> DataFrame:
    """(_id, band, bhash) ids-only banding rows — the batch operator's
    shuffle shape (operators/dedup.minhash_lsh_pairs)."""
    rows_per_band = num_perm // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.col("minhash")[b * rows_per_band + r].cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("bhash"),
            )
            for b in range(bands)
        ]
    )
    return sigged.select("_id", F.explode(band_structs).alias("bs")).select(
        "_id", F.col("bs.band").alias("band"), F.col("bs.bhash").alias("bhash")
    )


def _est_jaccard(a: str, b: str, num_perm: int):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    ) / F.lit(float(num_perm))


def stream_neardup_flag_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_path: str,
    text_col: str = "text",
    id_col: str = "url",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """Flag near-duplicates in one micro-batch against all earlier
    batches (via the store) and within the batch itself; append the
    survivors' signatures to the store. Returns the batch with a
    `near_dup` boolean column (flag-only — rows are never dropped
    here; fold the flag downstream exactly like exact_dup).

    Call from foreachBatch — and release the two per-batch caches
    after the write, or a long-running stream accumulates cached
    signature/flag blocks until ContextCleaner GC:

        from pcornet_data_curation_spark.operators.dedup import unpersist_deps

        def on_batch(bdf, bid):
            flagged = stream_neardup_flag_batch(bdf, bid, store)
            flagged.write.mode("append").parquet(out)
            unpersist_deps(flagged)

    Within-batch survivor = min id of a verified pair; cross-batch
    survivor = the stored (earlier) doc. A batch replay overwrites its
    own store partition (idempotent).
    """
    spark = batch_df.sparkSession
    sigged = (
        with_minhash(batch_df, text_col, num_perm, k, seed)
        .select(F.col(id_col).alias("_id"), "minhash")
        .where(F.col("minhash")[0] != F.lit(H.MINHASH_P))
        .persist()
    )
    banded = _band_rows(sigged, num_perm, bands)

    # -- within-batch: verified pairs, min id survives --
    l, r = banded.alias("l"), banded.alias("r")
    intra = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bhash") == F.col("r.bhash"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .join(sigged.select(F.col("_id").alias("id_a"), F.col("minhash").alias("sa")), "id_a")
        .join(sigged.select(F.col("_id").alias("id_b"), F.col("minhash").alias("sb")), "id_b")
        .where(_est_jaccard("sa", "sb", num_perm) >= threshold)
        .select(F.col("id_b").alias("_id"))
    )

    # -- cross-batch: probe the persisted store --
    bands_dir = os.path.join(store_path, BANDS_SUBDIR)
    sigs_dir = os.path.join(store_path, SIGS_SUBDIR)
    flagged_ids = intra
    if _store_exists(spark, bands_dir):
        # batch < batch_id: a REPLAYED batch must not probe the store
        # partition its failed attempt may have written (it would
        # self-match and flag everything); the predicate partition-
        # prunes, so the guard is free
        store_bands = (
            spark.read.option("basePath", bands_dir)
            .parquet(bands_dir)
            .where(F.col("batch") < int(batch_id))
        )
        store_sigs = (
            spark.read.option("basePath", sigs_dir)
            .parquet(sigs_dir)
            .where(F.col("batch") < int(batch_id))
        )
        cross = (
            banded.join(
                store_bands.select(
                    F.col("_id").alias("_sid"), "band", "bhash"
                ),
                ["band", "bhash"],
            )
            .select("_id", "_sid")
            .dropDuplicates(["_id", "_sid"])
            .join(sigged.select("_id", F.col("minhash").alias("sa")), "_id")
            .join(
                store_sigs.select(F.col("_id").alias("_sid"), F.col("minhash").alias("sb")),
                "_sid",
            )
            .where(_est_jaccard("sa", "sb", num_perm) >= threshold)
            .select("_id")
        )
        flagged_ids = intra.unionByName(cross)
    flagged_ids = flagged_ids.distinct().withColumn("_nd", F.lit(True)).persist()

    # -- append survivors' rows to the store (replay-idempotent) --
    survivors = sigged.join(flagged_ids.select("_id"), "_id", "left_anti")
    (
        survivors.withColumn("batch", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(sigs_dir)
    )
    (
        _band_rows(survivors, num_perm, bands)
        .withColumn("batch", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(bands_dir)
    )

    out = (
        batch_df.join(
            flagged_ids.select(F.col("_id").alias(id_col), "_nd"), id_col, "left"
        )
        .withColumn("near_dup", F.coalesce(F.col("_nd"), F.lit(False)))
        .drop("_nd")
    )
    # materialization boundary: the caller's write consumes `out` once;
    # release the two per-batch caches afterwards via the attached deps
    out._persisted_deps = [sigged, flagged_ids]
    return out
