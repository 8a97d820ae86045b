#!/usr/bin/env python
"""Bench harness: runs the headline query set on one warm SparkSession.

Protocol (BASELINE.md §3): per-query DuckDB baseline time at sf0.1 is
0.004-0.26 s while a Spark session costs ~6 s to start, so the bench
amortizes startup: one session, untimed warm-up passes (JIT + codegen +
parquet footer caches), then a timed sequential pass per query (isolated
per-query latencies) and a timed concurrent pass of the whole set
(set throughput — the headline `value`; see the inline rationale).
Round 3 adds variance: the sequential pass is repeated N_REPS times (per-query
min/mean/stdev) and the concurrent whole-set N_CONC times, so a round-over-
round delta can be told apart from run-to-run noise (the r1→r2 `rollup_qty`
"regression" was exactly this ambiguity with n=1). Prints ONE JSON line:

    {"metric": "...", "value": <best concurrent whole-set sec>, "unit": "sec",
     "queries": {name: <min sequential sec>, ...},
     "queries_mean": {...}, "queries_stdev": {...},
     "sequential_wall_sec": ..., "concurrent_wall_sec": ...,
     "concurrent_runs": [...], "reps": N, "sf": <sf>}

`value` and `queries` keep their r1/r2 meaning (comparable across rounds) but
now report the min over reps — the standard systems-bench convention for
isolating the code's cost from scheduler jitter.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_BENCH_REPS (default 5), SPARK_GRAFT_BENCH_CONC_REPS (3).
"""

from __future__ import annotations

import json
import os
import statistics
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

    n_reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))
    n_conc = int(os.environ.get("SPARK_GRAFT_BENCH_CONC_REPS", "3"))

    samples: dict[str, list[float]] = {name: [] for name in bench_names}
    for _ in range(n_reps):
        # Fresh DataFrame instances per rep: same logical plan, new lineage,
        # so no stage reuse via still-registered shuffle outputs.
        dfs_timed = {name: specs[name].fn(spark, sf_dir) for name in bench_names}
        for name in bench_names:
            t0 = time.perf_counter()
            dfs_timed[name].toPandas()
            samples[name].append(time.perf_counter() - t0)

    timings = {name: round(min(s), 4) for name, s in samples.items()}
    timings_mean = {name: round(statistics.fmean(s), 4) for name, s in samples.items()}
    timings_stdev = {
        name: round(statistics.stdev(s), 4) if len(s) > 1 else 0.0
        for name, s in samples.items()
    }
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

    conc_runs: list[float] = []
    for _ in range(n_conc):
        dfs_conc = {name: specs[name].fn(spark, sf_dir) for name in bench_names}
        threads = [
            threading.Thread(target=df.toPandas) for df in dfs_conc.values()
        ]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        conc_runs.append(round(time.perf_counter() - t0, 4))
    concurrent = min(conc_runs)

    print(
        json.dumps(
            {
                "metric": "headline_query_set_wall_sec",
                "value": concurrent,
                "unit": "sec",
                "queries": timings,
                "queries_mean": timings_mean,
                "queries_stdev": timings_stdev,
                "sequential_wall_sec": sequential,
                "concurrent_wall_sec": concurrent,
                "concurrent_runs": conc_runs,
                "reps": n_reps,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
