"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark at the given
sf dir and, where an oracle exists, the same-named ``oracle_sql()``
SQL in DuckDB over the same parquet files; compares row count, sorted
column names, and an order-insensitive exact value comparison
(columns sorted by name, rows sorted, NaN==NaN, floats bit-compared).

Usage: python tools/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out.columns = [str(c) for c in out.columns]
    out = out[sorted(out.columns)]
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            # int64, NOT float64: the driver's value-hash is typed, so a
            # DuckDB HUGEINT vs Spark bigint divergence must FAIL here
            # too, and values >2^53 (xxhash64, big ids) must not lose
            # precision. astype would wrap silently on overflow, so
            # round-trip check it.
            v = s.astype("int64")
            if not (v.astype(s.dtype) == s).all():
                raise OverflowError(f"column {c}: value outside int64")
            out[c] = v
        elif pd.api.types.is_bool_dtype(s):
            out[c] = s.astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]").astype("int64").astype("float64")
        else:
            out[c] = s.astype(object).where(s.notna(), None).map(
                lambda v: None if v is None else str(v)
            )
    out = out.sort_values(by=list(out.columns), kind="mergesort", na_position="last")
    return out.reset_index(drop=True)


def _kind(s: pd.Series) -> str:
    if pd.api.types.is_bool_dtype(s):
        return "int"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "ts"
    return "obj"


def equal_frames(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if sorted(a.columns) != sorted(b.columns):
        return False, f"columns {sorted(a.columns)} vs {sorted(b.columns)}"
    if len(a) != len(b):
        return False, f"rows {len(a)} vs {len(b)}"
    # typed gate: an int column on one side vs float on the other (e.g.
    # DuckDB widening SUM(int) to HUGEINT->float64) fails the driver's
    # value-hash even when values agree — replicate that strictness
    for c in sorted(a.columns):
        ka, kb = _kind(a[c]), _kind(b[c])
        if ka != kb:
            return False, f"col {c} dtype kind: spark={ka} oracle={kb}"
    na, nb = normalize(a), normalize(b)
    for c in na.columns:
        x, y = na[c].to_numpy(), nb[c].to_numpy()
        if na[c].dtype == np.float64:
            ok = (x == y) | (np.isnan(x.astype(float)) & np.isnan(y.astype(float)))
        else:
            ok = np.array([p == q for p, q in zip(x, y)])
        if not ok.all():
            i = int(np.argmin(ok))
            return False, f"col {c} row {i}: spark={x[i]!r} oracle={y[i]!r}"
    return True, ""


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--plain-session"]
    plain = "--plain-session" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    sys.path.insert(0, ".")
    import os

    # lazy oracle generators (ivf_topk) read the oracle sf dir from env
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    import __spark_entry__ as E

    if plain:
        # replicate the DRIVER's environment: a bare session with none
        # of our configs (no UTC pin, default shuffle partitions, no
        # Arrow tuning) — queries must be config-independent
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName("plain").getOrCreate()
    else:
        from pcornet_data_curation_spark.session import get_spark

        spark = get_spark(app_name="check_entry")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = E.queries(), E.oracle_sql()
    failed, passed, rows_only = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            q = fn(spark, sf_dir)
            sdf = q.toPandas()
            # release operator-attached caches (same post-materialize
            # hook as bench._sink; see dedup.unpersist_deps)
            from pcornet_data_curation_spark.operators.dedup import unpersist_deps

            unpersist_deps(q)
        except Exception:
            traceback.print_exc()
            failed.append((name, "spark raised"))
            print(f"FAIL  {name}: spark raised")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"rows  {name}: {len(sdf)} rows [{time.time()-t0:.1f}s] (no oracle)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failed.append((name, f"oracle raised: {e}"))
            print(f"FAIL  {name}: oracle raised: {e}")
            continue
        ok, why = equal_frames(sdf, odf)
        if ok:
            passed.append(name)
            print(f"ok    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
        else:
            failed.append((name, why))
            print(f"FAIL  {name}: {why}")

    print(
        f"\n{len(passed)} oracle-matched, {len(rows_only)} rows-only, {len(failed)} failed"
    )
    for name, why in failed:
        print(f"  FAIL {name}: {why}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
