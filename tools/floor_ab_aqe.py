#!/usr/bin/env python
"""Interleaved A/B: AQE on vs off for the bench-tier sequential set.

Experiment 1's sequential sweep ran variants back-to-back in one JVM, so
later variants were more JIT-warm — this interleaves A and B reps
(ABABAB...) after a deep warm-up of BOTH, which cancels warm-up drift.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from big_data__instagram_analysis_spark import session as S
from big_data__instagram_analysis_spark.registry import get_specs
from big_data__instagram_analysis_spark.session import enable_bench_tuning, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_once(spark, specs, names):
    dfs = {n: specs[n].fn(spark, SF_DIR) for n in names}
    t0 = time.perf_counter()
    for n in names:
        dfs[n].toPandas()
    return time.perf_counter() - t0


def main() -> None:
    enable_bench_tuning()
    specs = get_specs()
    names = [n for n, s in sorted(specs.items()) if "bench" in s.tags or "flagship" in s.tags]
    spark = get_spark("floor-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def set_aqe(v: str):
        S.RUNTIME_CONF["spark.sql.adaptive.enabled"] = v

    # deep warm-up under both configs
    for v in ("true", "false", "true", "false"):
        set_aqe(v)
        for n in names:
            specs[n].fn(spark, SF_DIR).toPandas()

    a, b = [], []
    for _ in range(5):
        set_aqe("true")
        a.append(run_once(spark, specs, names))
        set_aqe("false")
        b.append(run_once(spark, specs, names))
    print(f"AQE on : min {min(a):.3f}  mean {statistics.fmean(a):.3f}  {[round(x,3) for x in a]}")
    print(f"AQE off: min {min(b):.3f}  mean {statistics.fmean(b):.3f}  {[round(x,3) for x in b]}")
    spark.stop()


if __name__ == "__main__":
    main()
