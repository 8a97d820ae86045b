#!/usr/bin/env python
"""State-store metrics for the heavy streaming queries (VERDICT r6 #6).

PERF.md §42 declined the obvious conf levers for the 5–10 s streaming
queries because their multi-batch watermark/state semantics require the
micro-batch cost; this tool adds the measurement that makes the "state is
bounded" claim checkable: per query, the state-store row/byte high-water
marks, final-batch operator state, and watermark-dropped row counts,
harvested from StreamingQueryProgress by the harness
(streaming/harness.py PROGRESS_LOG) while the query runs normally.

Usage: python tools/stream_state_metrics.py [--sf /root/testdata/sf0.1]
Writes STREAM_STATE.json at the repo root and prints one summary line per
query. Boundedness argument: max_state_rows must be O(distinct keys or
in-horizon rows), never O(all rows ever seen) — the JSON records the
input row count next to each query so the ratio is visible.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

HEAVY_STREAMING = [
    "stream_stream_join_pairs",
    "stream_stateful_user_counter",
    "stream_watermark_tumbling",
    "stream_stream_left_outer",
    "stream_stream_full_outer",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", default=",".join(HEAVY_STREAMING))
    ap.add_argument("--out", default=os.path.join(REPO_ROOT, "STREAM_STATE.json"))
    args = ap.parse_args()

    from big_data__instagram_analysis_spark.io import load
    from big_data__instagram_analysis_spark.registry import get_specs
    from big_data__instagram_analysis_spark.session import get_spark
    from big_data__instagram_analysis_spark.streaming import harness

    spark = get_spark("iga-stream-state")
    spark.sparkContext.setLogLevel("ERROR")
    specs = get_specs()
    n_events = load(spark, args.sf, "events").count()

    results: dict[str, dict] = {}
    for name in [q.strip() for q in args.queries.split(",") if q.strip()]:
        harness.reset_progress_log()
        t0 = time.perf_counter()
        rows_out = len(specs[name].fn(spark, args.sf).toPandas())
        wall = round(time.perf_counter() - t0, 3)
        runs = list(harness.PROGRESS_LOG)
        results[name] = {
            "wall_sec": wall,
            "rows_out": rows_out,
            "input_rows_events": n_events,
            "streaming_queries_executed": len(runs),
            "max_state_rows": max((r["max_state_rows"] for r in runs), default=0),
            "max_state_bytes": max((r["max_state_bytes"] for r in runs), default=0),
            "rows_dropped_by_watermark": sum(
                r["rows_dropped_by_watermark"] for r in runs
            ),
            "runs": runs,
        }
        r = results[name]
        print(
            f"{name:32s} wall={wall:7.2f}s state_rows<= {r['max_state_rows']:>8} "
            f"({r['max_state_rows'] / max(n_events, 1):.2%} of input) "
            f"state_bytes<= {r['max_state_bytes']:>12,} dropped={r['rows_dropped_by_watermark']}",
            flush=True,
        )

    payload = {
        "metric": "stream_state_metrics",
        "sf_dir": args.sf,
        "queries": results,
        "note": (
            "max_state_rows/bytes are high-water marks over every micro-batch "
            "of every StreamingQuery the operator executes (multi-pass queries "
            "run several); boundedness = state scales with keys/in-horizon "
            "rows, not total rows seen. Harvested from StreamingQueryProgress "
            "stateOperators via streaming/harness.PROGRESS_LOG."
        ),
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    print(json.dumps({
        "metric": "stream_state_metrics",
        "max_state_rows": {n: v["max_state_rows"] for n, v in results.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
