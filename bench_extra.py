"""Per-query isolated benchmark + plan capture (guide §1).

bench.py is the FROZEN driver contract; this file is the builder's
measurement harness for the optimization round: it times individual
registry queries with the noop sink (full computation, no driver
materialization), best-of-N, with the same cache-clear + GC isolation
bench.py uses between entries, and can dump `.explain("formatted")`
for each query to plans/r06/.

Usage:
    python bench_extra.py q1 q2 ...            # time the named queries
    python bench_extra.py --all                # the whole HEADLINE list
    python bench_extra.py --explain SUFFIX q1  # write plans/r06/q1_SUFFIX.txt
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py ngram_jaccard_pairs
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--explain", metavar="SUFFIX", default=None,
                    help="write plans/r06/<query>_<SUFFIX>.txt and skip timing")
    args = ap.parse_args()

    from bench import HEADLINE, _sink
    from pcornet_data_curation_spark import queries as Q
    from pcornet_data_curation_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    names = HEADLINE if args.all else args.names
    spark = get_spark(app_name="bench-extra", cores=cpus)
    qs = Q.queries()

    if args.explain:
        os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(REPO, "plans", "r06", f"{name}_{args.explain}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"wrote {path}")
        spark.stop()
        return 0

    spark.range(0, 10_000_000, 1, cpus).selectExpr("sum(id)").collect()  # warm
    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in names:
        best = float("inf")
        samples[name] = []
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            _sink(qs[name](spark, sf_dir))
            dt = time.perf_counter() - t0
            samples[name].append(round(dt, 3))
            best = min(best, dt)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]} s  {samples[name]}", flush=True)
    print(json.dumps({
        "metric": "bench_extra_sec", "queries": timings, "samples": samples,
        "sf": sf_dir.rstrip("/").split("sf")[-1], "cpus": cpus,
        "load_1min": round(os.getloadavg()[0], 2),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
