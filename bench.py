#!/usr/bin/env python
"""Bench harness: runs the headline query set on one warm SparkSession.

Protocol (BASELINE.md §3): per-query DuckDB baseline time at sf0.1 is
0.004-0.26 s while a Spark session costs ~6 s to start, so the bench
amortizes startup: one session, untimed warm-up passes (JIT + codegen +
parquet footer caches), then a timed sequential pass per query (isolated
per-query latencies) and a timed concurrent pass of the whole set
(set throughput — the headline `value`; see the inline rationale).
Prints ONE JSON line:

    {"metric": "...", "value": <concurrent whole-set sec>, "unit": "sec",
     "queries": {name: <sequential sec>, ...},
     "sequential_wall_sec": ..., "concurrent_wall_sec": ..., "sf": <sf>}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from big_data__instagram_analysis_spark.registry import get_specs
    from big_data__instagram_analysis_spark.session import enable_bench_tuning, get_spark

    # Small-file scan parallelism + low shuffle fan-out for the MB-scale bench
    # tier (see session.enable_bench_tuning docstring — not the 100 TB confs).
    enable_bench_tuning()

    specs = get_specs()
    bench_names = [n for n, s in sorted(specs.items()) if "bench" in s.tags or "flagship" in s.tags]

    spark = get_spark("iga-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up executes fresh DataFrame instances per query (JIT/codegen
    # caches, broadcast hydration, FS cache). Two passes: C2-tier JIT of the
    # hot codegen'd loops needs more than one execution to reach the steady
    # state the BASELINE's "warm" (second-run) DuckDB numbers represent.
    # The timed pass executes a SEPARATELY built instance: same logical plan
    # but fresh lineage, so the scheduler cannot skip stages via
    # still-registered shuffle outputs — the timed run does the full
    # scan/shuffle/agg work. Timing covers analysis + execution + Arrow
    # collection; Py4J plan-construction chatter stays outside.
    for _ in range(3):
        for name in bench_names:
            specs[name].fn(spark, sf_dir).toPandas()
    dfs_timed = {name: specs[name].fn(spark, sf_dir) for name in bench_names}

    timings: dict[str, float] = {}
    for name in bench_names:
        t0 = time.perf_counter()
        dfs_timed[name].toPandas()
        timings[name] = round(time.perf_counter() - t0, 4)
    sequential = round(sum(timings.values()), 4)

    # Whole-set wall: the query set submitted concurrently to the warm
    # scheduler (fresh DataFrame instances again — no stage reuse). At
    # bench tier each job's stages are sub-core-count wide, so sequential
    # submission leaves the 32-way executor mostly idle between stages and
    # the whole-set number degenerates into 10× per-job scheduling latency.
    # Concurrent submission is Spark's designed multi-tenancy path (one
    # job queue, many submitters) and measures set THROUGHPUT the same way
    # BASELINE.md §2 frames DuckDB's "whole-set ≈ 9 q/s". Per-query
    # latencies above remain sequential/isolated for honest comparison —
    # both numbers are reported.
    import threading

    dfs_conc = {name: specs[name].fn(spark, sf_dir) for name in bench_names}
    threads = [
        threading.Thread(target=df.toPandas) for df in dfs_conc.values()
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    concurrent = round(time.perf_counter() - t0, 4)

    print(
        json.dumps(
            {
                "metric": "headline_query_set_wall_sec",
                "value": concurrent,
                "unit": "sec",
                "queries": timings,
                "sequential_wall_sec": sequential,
                "concurrent_wall_sec": concurrent,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
