#!/usr/bin/env python
"""Controlled A/B for minhash's in-session spread (VERDICT r8 task #1).

PERF.md §51 measured minhash_lsh_neardup reading 2.3-2.8 s fresh-session
but 2.8-3.1 s after ~10 min of headline benching in the same JVM, with
plan-level causes eliminated (dead checkpoint blocks, pinned predecessor
blocks, a semi-join prefilter tried and reverted). Remaining suspect: JVM
aging (code-cache / JIT recompilation state accumulated by the headline
set). This tool tests exactly that, in ONE JVM:

  A. fresh phase — 5 paired (floor, wall) reps of minhash_lsh_neardup
     immediately after session warm-up (2 untimed warm passes);
  B. churn phase — untimed: loop the 10-query headline set (plus their
     1-row floor plans, mirroring bench.py's workload mix) for
     --churn-sec wall seconds (default 480 ≈ the headline bench span);
  C. aged phase — the same 5 paired reps again, same JVM.

Pairing floor (1-row input copies, identical plan) with wall per rep lets
the aged/fresh comparison be made on the floor-corrected datapath, the
number the 2x bar is judged on. GC (driver + JVM) runs before every rep,
outside the timed regions — same hygiene as bench.py.

Writes JVM_AGE_AB.json: per-phase rep pairs, min/mean/stdev of wall and
of paired datapath, and the aged/fresh ratios. Interpretation rule used
in PERF.md §52: aged_dp_min / fresh_dp_min > 1.15 with non-overlapping
spreads confirms JVM aging; then the bench protocol must isolate sets in
fresh JVMs (bench.py round-9 subprocess-per-set mode) so the reported
number measures the plan, not the session's history.

Usage: python tools/jvm_age_ab.py [--churn-sec 480] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from bench import _build_floor_tables  # noqa: E402
from big_data__instagram_analysis_spark.registry import get_specs  # noqa: E402
from big_data__instagram_analysis_spark.session import (  # noqa: E402
    enable_bench_tuning,
    get_spark,
)

TARGET = "minhash_lsh_neardup"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--churn-sec", type=float, default=480.0)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default=os.path.join(REPO_ROOT, "JVM_AGE_AB.json"))
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    enable_bench_tuning()
    specs = get_specs()
    headline = [
        n for n, s in sorted(specs.items()) if "bench" in s.tags or "flagship" in s.tags
    ]

    spark = get_spark("iga-jvm-age-ab")
    spark.sparkContext.setLogLevel("ERROR")

    floor_dir = os.path.join(REPO_ROOT, "spark-warehouse", "bench_floor_tables")
    _build_floor_tables(sf_dir, floor_dir)

    import gc

    def gc_both() -> None:
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    def paired_reps(n: int) -> list[dict[str, float]]:
        pairs = []
        for _ in range(n):
            gc_both()
            f_df = specs[TARGET].fn(spark, floor_dir)
            t0 = time.perf_counter()
            f_df.toPandas()
            f = time.perf_counter() - t0
            w_df = specs[TARGET].fn(spark, sf_dir)
            t0 = time.perf_counter()
            w_df.toPandas()
            w = time.perf_counter() - t0
            pairs.append(
                {"floor": round(f, 4), "wall": round(w, 4), "dp": round(w - f, 4)}
            )
        return pairs

    def summarize(pairs: list[dict[str, float]]) -> dict:
        walls = [p["wall"] for p in pairs]
        dps = [p["dp"] for p in pairs]
        return {
            "pairs": pairs,
            "wall_min": round(min(walls), 4),
            "wall_mean": round(statistics.fmean(walls), 4),
            "wall_stdev": round(statistics.stdev(walls), 4) if len(walls) > 1 else 0.0,
            "dp_min": round(min(dps), 4),
            "dp_mean": round(statistics.fmean(dps), 4),
            "dp_stdev": round(statistics.stdev(dps), 4) if len(dps) > 1 else 0.0,
        }

    # Warm both plan shapes (sf + floor), 2 passes each — bench.py parity.
    for _ in range(2):
        specs[TARGET].fn(spark, sf_dir).toPandas()
        specs[TARGET].fn(spark, floor_dir).toPandas()

    print(f"[ab] fresh phase: {args.reps} paired reps", file=sys.stderr)
    fresh = summarize(paired_reps(args.reps))

    print(f"[ab] churn phase: headline set loop for {args.churn_sec}s", file=sys.stderr)
    churn_t0 = time.perf_counter()
    churn_loops = 0
    while time.perf_counter() - churn_t0 < args.churn_sec:
        for name in headline:
            specs[name].fn(spark, sf_dir).toPandas()
            specs[name].fn(spark, floor_dir).toPandas()
        churn_loops += 1
    churn_wall = round(time.perf_counter() - churn_t0, 1)

    print(f"[ab] aged phase: {args.reps} paired reps", file=sys.stderr)
    aged = summarize(paired_reps(args.reps))

    out = {
        "target": TARGET,
        "sf_dir": sf_dir,
        "reps": args.reps,
        "churn_sec": churn_wall,
        "churn_loops": churn_loops,
        "fresh": fresh,
        "aged": aged,
        "aged_over_fresh_wall_min": round(aged["wall_min"] / fresh["wall_min"], 3),
        "aged_over_fresh_dp_min": round(aged["dp_min"] / fresh["dp_min"], 3),
        "note": (
            "Same JVM throughout; pairs are (1-row-floor, sf-wall) back-to-back "
            "with GC outside the timed regions. aged/fresh dp_min > 1.15 with "
            "non-overlapping spreads = JVM aging confirmed (PERF.md §52)."
        ),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({k: out[k] for k in ("aged_over_fresh_wall_min", "aged_over_fresh_dp_min", "churn_loops")}))
    spark.stop()


if __name__ == "__main__":
    main()
