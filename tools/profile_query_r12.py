"""Round-12 per-query profiler: wall time + formatted plan capture.

Usage:
    python tools/profile_query_r12.py [--sf /root/testdata/sf0.1]
        [--reps 3] [--plan-dir plans/r12] [--suffix before] [--no-plan]
        name [name ...]

Protocol matches the sf0.1 sweep that produced tests/sf01_budgets.json:
driver-style session (local[8], hostile non-UTC tz, default confs), each
query timed via fn(spark, sf).toPandas(). Reports the cold (first) run and
the min of the warm reps, plus jobs/stages counts for the cold run. With
--plan-dir, writes `<plan-dir>/<name>_<suffix>.txt` containing
explain("formatted") of the exact DataFrame the query returns — the
before/after evidence files for OPTIMIZATION_r12.md.
"""
import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--plan-only", action="store_true",
                    help="skip timing; just write the formatted plans")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("profile-r12")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    for name in args.names:
        if name not in qs:
            print(f"UNKNOWN query: {name}")
            return 2
        fn = qs[name]
        if args.plan_only:
            if args.plan_dir:
                os.makedirs(args.plan_dir, exist_ok=True)
                df = fn(spark, args.sf)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                path = os.path.join(args.plan_dir, f"{name}_{args.suffix}.txt")
                with open(path, "w") as f:
                    f.write(plan)
                print(f"{name}: plan -> {path}")
            continue
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        jobs_before = set(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        fn(spark, args.sf).toPandas()
        cold = time.perf_counter() - t0
        new_jobs = set(tracker.getJobIdsForGroup(None) or []) - jobs_before
        stages = 0
        for j in new_jobs:
            ji = tracker.getJobInfo(j)
            stages += len(ji.stageIds) if ji is not None else 0
        warms = []
        for _ in range(args.reps):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            fn(spark, args.sf).toPandas()
            warms.append(time.perf_counter() - t0)
        out[name] = {
            "cold_sec": round(cold, 3),
            "warm_min_sec": round(min(warms), 3),
            "warm_all": [round(w, 3) for w in warms],
            "jobs": len(new_jobs),
            "stages": stages,
        }
        print(f"{name}: cold {cold:.2f}s warm_min {min(warms):.2f}s "
              f"jobs {len(new_jobs)} stages {stages}")
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(args.plan_dir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"  plan -> {path}")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
