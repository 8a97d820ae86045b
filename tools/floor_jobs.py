#!/usr/bin/env python
"""Count Spark jobs/stages/tasks per headline query (feeds PERF.md §3 and
the BENCH_r04 floor decomposition): per-query wall ≈ jobs × job floor +
stages × stage floor + real work. Uses the status tracker's job/stage ids
delta around each timed action."""

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


def main() -> None:
    enable_bench_tuning()
    S.RUNTIME_CONF.update(
        {
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
            "spark.sql.shuffle.partitions": "4",
        }
    )
    specs = get_specs()
    names = [n for n, s in sorted(specs.items()) if "bench" in s.tags or "flagship" in s.tags]
    spark = get_spark("floor-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    st = spark.sparkContext.statusTracker()

    for _ in range(3):
        for n in names:
            specs[n].fn(spark, SF_DIR).toPandas()

    print(f"{'query':28s} {'jobs':>4s} {'stages':>6s} {'tasks':>6s} {'sec':>7s}")
    total_jobs = total_stages = 0
    for n in names:
        df = specs[n].fn(spark, SF_DIR)
        before_jobs = set(st.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        df.toPandas()
        dt = time.perf_counter() - t0
        after_jobs = set(st.getJobIdsForGroup(None) or [])
        new_jobs = sorted(after_jobs - before_jobs)
        stages = tasks = 0
        for j in new_jobs:
            ji = st.getJobInfo(j)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = st.getStageInfo(sid)
                if si is not None:
                    stages += 1
                    tasks += si.numTasks
        total_jobs += len(new_jobs)
        total_stages += stages
        print(f"{n[:28]:28s} {len(new_jobs):4d} {stages:6d} {tasks:6d} {dt:7.3f}")
    print(f"{'TOTAL':28s} {total_jobs:4d} {total_stages:6d}")
    spark.stop()


if __name__ == "__main__":
    main()
