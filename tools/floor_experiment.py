#!/usr/bin/env python
"""One-off experiment: sequential headline-set wall under conf variants.

Feeds PERF.md §3's floor decomposition (VERDICT r3 next-round #1/#7).
Run: python tools/floor_experiment.py
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from big_data__instagram_analysis_spark import session as S
from big_data__instagram_analysis_spark.registry import get_specs
from big_data__instagram_analysis_spark.session import enable_bench_tuning, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

VARIANTS: dict[str, dict[str, str]] = {
    "baseline(bench-tuned)": {},
    "aqe-off": {"spark.sql.adaptive.enabled": "false"},
    "aqe-off+16m-splits": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
    },
    "aqe-off+shufpart4": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "4",
    },
    "aqe-on-nolocalread": {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.localShuffleReader.enabled": "false",
    },
    "aqe-off+128m-splits": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    },
}


def main() -> None:
    enable_bench_tuning()
    base = dict(S.RUNTIME_CONF)
    specs = get_specs()
    names = [n for n, s in sorted(specs.items()) if "bench" in s.tags or "flagship" in s.tags]
    spark = get_spark("floor-exp")
    spark.sparkContext.setLogLevel("ERROR")

    for _ in range(3):  # warm-up
        for n in names:
            specs[n].fn(spark, SF_DIR).toPandas()

    results: dict[str, tuple[float, dict[str, float]]] = {}
    for label, overrides in VARIANTS.items():
        S.RUNTIME_CONF.clear()
        S.RUNTIME_CONF.update(base)
        S.RUNTIME_CONF.update(overrides)
        # one untimed adaptation pass, then 2 timed reps, take min
        for n in names:
            specs[n].fn(spark, SF_DIR).toPandas()
        best_total = float("inf")
        best_per: dict[str, float] = {}
        for _ in range(2):
            per = {}
            dfs = {n: specs[n].fn(spark, SF_DIR) for n in names}
            for n in names:
                t0 = time.perf_counter()
                dfs[n].toPandas()
                per[n] = time.perf_counter() - t0
            tot = sum(per.values())
            if tot < best_total:
                best_total, best_per = tot, per
        results[label] = (best_total, best_per)
        print(f"{label:28s} {best_total:6.3f}s", flush=True)

    print("\nper-query breakdown (best rep):")
    hdr = ["query"] + list(results)
    print(" | ".join(h[:26] for h in hdr))
    for n in names:
        row = [f"{n[:26]:26s}"] + [f"{results[k][1][n]:.3f}" for k in results]
        print(" | ".join(row))
    spark.stop()


if __name__ == "__main__":
    main()
