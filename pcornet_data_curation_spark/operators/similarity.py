"""Similarity search over an embedding column (array<float>).

* brute_force_topk — exact cosine top-k, pure JVM Column algebra
  (zip_with/aggregate dot product inside whole-stage codegen; the
  scan reads only (id, vector) — column pruning).
* lsh_topk — sign-LSH bucketed approximate top-k: probe only vectors
  sharing (or nearly sharing) the query's hyperplane-sign bucket.
  The scale path: bucket assignment is a one-pass projection, the
  probe is a bucket-pruned filter, so 10^12 vectors never fan out
  into a global sort wider than the probed buckets.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcornet_data_curation_spark.functions import hashing as H


def _dot_with_literal(vec_col, query: list[float]):
    arr = F.array(*[F.lit(float(x)) for x in query])
    return F.aggregate(
        F.zip_with(vec_col, arr, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(vec_col):
    return F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda acc, v: acc + v * v))


def brute_force_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k for one query vector. orderBy(desc).limit(k)
    compiles to TakeOrderedAndProject — per-partition top-k heaps, no
    full sort/shuffle of the scores."""
    qn = math.sqrt(sum(x * x for x in query)) or 1.0
    v = F.col(vec_col).cast("array<double>")
    # raw double, no F.round: Spark's decimal-string HALF_UP round
    # diverges from other engines' binary rounding, and the identical
    # IEEE expression tree already reproduces bit-for-bit in the oracle
    cos = _dot_with_literal(v, query) / (_norm(v) * F.lit(qn))
    return (
        df.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def with_lsh_bucket(
    df: DataFrame, dim: int, n_planes: int = 8, vec_col: str = "embedding", seed: int = 42
) -> DataFrame:
    """Assign each vector its hyperplane-sign bucket string (one
    projection; planes are deterministic literals from seed)."""
    planes = H.hyperplane_signs(dim, n_planes, seed)
    v = F.col(vec_col).cast("array<double>")
    bits = [
        (_dot_with_literal(v, [float(x) for x in planes[p]]) >= 0).cast("int").cast("string")
        for p in range(n_planes)
    ]
    return df.withColumn("lsh_bucket", F.concat_ws("", *bits))


def query_bucket(query: list[float], n_planes: int = 8, seed: int = 42) -> str:
    planes = H.hyperplane_signs(len(query), n_planes, seed)
    return "".join(
        "1" if float(sum(a * b for a, b in zip(planes[p], query))) >= 0 else "0"
        for p in range(n_planes)
    )


def lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 8,
    max_hamming: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only vectors whose sign-bucket is within
    `max_hamming` bit flips of the query's bucket (multi-probe LSH).
    With a pre-bucketed (even partitioned-by-bucket) table the filter
    prunes the scan; recall grows with max_hamming."""
    qb = query_bucket(query, n_planes, seed)
    bucketed = df if "lsh_bucket" in df.columns else with_lsh_bucket(
        df, len(query), n_planes, vec_col, seed
    )
    # hamming distance between the fixed-length '0'/'1' bucket strings
    ham = F.aggregate(
        F.zip_with(
            F.split(F.col("lsh_bucket"), ""),
            F.split(F.lit(qb), ""),
            lambda a, b: (a != b).cast("int"),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    probed = bucketed.where(ham <= max_hamming)
    return brute_force_topk(probed, query, k, vec_col, id_col)
