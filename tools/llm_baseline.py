#!/usr/bin/env python
"""Measure the DuckDB baseline for the LLM heavy-tail bench set.

VERDICT r6 "Next round #1": BASELINE.md §2 covers only the 10 headline
queries, so the driver's "within 2× of BASELINE" criterion could not be
evaluated for the 7-query `llm_bench` tail (minhash LSH, containment,
curation pipeline, …) — precisely the operators the brief mandates. This
script closes that hole the same way BASELINE.md §4 produced the headline
numbers: DuckDB (the driver's own oracle engine), views over the sf0.1
parquet, single connection, each query run cold then timed warm (second
run), wall-clock via time.perf_counter.

The SQL texts are the queries' REGISTERED ORACLES (the exact statements
the correctness gate runs at sf0.01) — the same computation, same output,
on the same files, so the ratio is engine-vs-engine, not query-vs-query.

Usage:  python tools/llm_baseline.py [--sf /root/testdata/sf0.1] [--reps 3]

Prints a per-query table + one JSON line, and (with --write) records the
result into LLM_BASELINE.json at the repo root, which bench.py reads to
emit `llm_datapath_vs_duckdb`.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from big_data__instagram_analysis_spark.oracle import duck_connect  # noqa: E402
from big_data__instagram_analysis_spark.registry import get_specs  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3, help="timed warm reps after 1 cold run")
    ap.add_argument("--write", action="store_true", help="write LLM_BASELINE.json")
    args = ap.parse_args()

    specs = get_specs()
    llm_names = sorted(n for n, s in specs.items() if "llm_bench" in s.tags)
    con = duck_connect(args.sf)

    out: dict[str, dict] = {}
    for name in llm_names:
        sql = specs[name].oracle
        assert sql, f"{name} has no oracle SQL"
        t0 = time.perf_counter()
        rows_cold = len(con.execute(sql).fetchall())
        cold = time.perf_counter() - t0
        warm: list[float] = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            rows = len(con.execute(sql).fetchall())
            warm.append(time.perf_counter() - t0)
        assert rows == rows_cold
        out[name] = {
            "warm_sec": round(min(warm), 4),
            "warm_mean_sec": round(statistics.fmean(warm), 4),
            "warm_stdev_sec": round(statistics.stdev(warm), 4) if len(warm) > 1 else 0.0,
            "cold_sec": round(cold, 4),
            "rows": rows,
        }
        print(
            f"{name:32s} warm={out[name]['warm_sec']:8.3f}s "
            f"(±{out[name]['warm_stdev_sec']:.3f}) cold={cold:8.3f}s rows={rows}"
        )

    total = round(sum(v["warm_sec"] for v in out.values()), 4)
    payload = {
        "metric": "llm_set_duckdb_warm_sec",
        "value": total,
        "unit": "sec",
        "sf_dir": args.sf,
        "reps": args.reps,
        "engine": f"duckdb {__import__('duckdb').__version__}",
        "queries": {n: v["warm_sec"] for n, v in out.items()},
        "detail": out,
        "note": (
            "warm = min of post-cold reps, per BASELINE.md §4 protocol; SQL "
            "texts are the registered correctness oracles (registry .oracle)"
        ),
    }
    print(json.dumps({k: payload[k] for k in ("metric", "value", "queries")}))
    if args.write:
        with open(os.path.join(REPO_ROOT, "LLM_BASELINE.json"), "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
        print(f"wrote LLM_BASELINE.json (total {total}s)")


if __name__ == "__main__":
    main()
