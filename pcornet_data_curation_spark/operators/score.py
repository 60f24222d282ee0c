"""Stage 2 — vectorized document scoring.

One Arrow-batched ``pandas_udf`` computes the entire per-document stat
struct (string heuristics + langid + perplexity) in a single pass over
each batch, calling the shared pure-pandas core
(functions.textcore.doc_stats_frame). No per-row Python UDFs; the same
core runs in the pandas oracle, so scores are bit-identical.

Reference analog: the scan+normalize step feeding the rule flags
(potential_code_errors.sas:301-314) — there the features are code
strings; here they are text-quality statistics and model-style scores.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from pcornet_data_curation_spark.functions.textcore import STAT_FIELDS, doc_stats_frame

_SPARK_TYPES = {
    "int64": T.LongType(),
    "float64": T.DoubleType(),
    "object": T.StringType(),
}

STATS_SCHEMA = T.StructType(
    [T.StructField(name, _SPARK_TYPES[dtype], True) for name, dtype in STAT_FIELDS]
)

STAT_COLS = [name for name, _ in STAT_FIELDS]


@pandas_udf(STATS_SCHEMA)
def _stats_udf(text: pd.Series) -> pd.DataFrame:
    return doc_stats_frame(text)


def with_doc_stats(df, text_col: str = "text"):
    """Append the flattened stat columns to ``df`` (one UDF evaluation,
    then a zero-cost struct flatten)."""
    scored = df.withColumn("_stats", _stats_udf(F.col(text_col)))
    return scored.select("*", *[F.col(f"_stats.{c}").alias(c) for c in STAT_COLS]).drop(
        "_stats"
    )
