#!/usr/bin/env python
"""Experiment 2: combined conf lever + cached fixtures + plan/exec split.

For each headline query measures:
  t_plan — DataFrame -> executedPlan (Catalyst analysis+optimization+physical
           planning, the per-query "compile" cost DuckDB also pays but in ms)
  t_exec — subsequent toPandas() (scheduling + execution + Arrow collect)

Variants: combined conf lever (AQE off at bench tier, 128m splits, 4 shuffle
parts) with and without cached (in-memory) fixture tables.
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from big_data__instagram_analysis_spark import io as IO
from big_data__instagram_analysis_spark import session as S
from big_data__instagram_analysis_spark.registry import get_specs
from big_data__instagram_analysis_spark.session import enable_bench_tuning, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

COMBINED = {
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.shuffle.partitions": "4",
}


def run_set(spark, specs, names, reps=3):
    best = {"plan": {}, "exec": {}}
    for rep in range(reps):
        dfs = {n: specs[n].fn(spark, SF_DIR) for n in names}
        for n in names:
            df = dfs[n]
            t0 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t1 = time.perf_counter()
            df.toPandas()
            t2 = time.perf_counter()
            if n not in best["plan"] or (t2 - t0) < best["plan"][n] + best["exec"][n]:
                best["plan"][n], best["exec"][n] = t1 - t0, t2 - t1
    return best


def main() -> None:
    enable_bench_tuning()
    S.RUNTIME_CONF.update(COMBINED)
    specs = get_specs()
    names = [n for n, s in sorted(specs.items()) if "bench" in s.tags or "flagship" in s.tags]
    spark = get_spark("floor-exp2")
    spark.sparkContext.setLogLevel("ERROR")

    for _ in range(3):
        for n in names:
            specs[n].fn(spark, SF_DIR).toPandas()

    r1 = run_set(spark, specs, names)
    tot1 = sum(r1["plan"].values()) + sum(r1["exec"].values())
    print(f"combined-conf: total {tot1:.3f}s  (plan {sum(r1['plan'].values()):.3f}s, exec {sum(r1['exec'].values()):.3f}s)", flush=True)

    # Now cache fixtures: memoize load() returning cached DataFrames.
    orig_load = IO.load
    cache: dict = {}

    def cached_load(spark_, sf_dir, name):
        key = (sf_dir, name)
        if key not in cache:
            cache[key] = orig_load(spark_, sf_dir, name).cache()
            cache[key].count()  # hydrate
        return cache[key]

    IO.load = cached_load
    try:
        for _ in range(2):
            for n in names:
                specs[n].fn(spark, SF_DIR).toPandas()
        r2 = run_set(spark, specs, names)
    finally:
        IO.load = orig_load
    tot2 = sum(r2["plan"].values()) + sum(r2["exec"].values())
    print(f"combined+cached: total {tot2:.3f}s  (plan {sum(r2['plan'].values()):.3f}s, exec {sum(r2['exec'].values()):.3f}s)", flush=True)

    print(f"\n{'query':28s} {'plan1':>7s} {'exec1':>7s} {'plan2':>7s} {'exec2':>7s}")
    for n in names:
        print(f"{n[:28]:28s} {r1['plan'][n]:7.3f} {r1['exec'][n]:7.3f} {r2['plan'][n]:7.3f} {r2['exec'][n]:7.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
