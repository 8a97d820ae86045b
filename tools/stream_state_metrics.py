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
import glob
import hashlib
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

HEAVY_STREAMING = [
    "stream_stream_join_pairs",
    "stream_stream_join_ttl",
    "stream_stateful_user_counter",
    "stream_watermark_tumbling",
    "stream_stream_left_outer",
    "stream_stream_full_outer",
]


def run_eviction_demos(spark, sf_dir: str) -> dict[str, dict]:
    """The two mandated shapes with PRODUCTION watermarks over the sentinel
    replay: the attribution join (1 h watermark vs its 30-min range bound)
    and the tumbling windowed agg (10-min windows, 1 h watermark, append).

    Round 9: the replay builder moved into the package
    (streaming/harness.evict_replay_dir — it now also backs the DECLARED
    stream_stream_join_ttl query) and the demos use its n_base_files=1
    form: the whole base table lands in micro-batch 1, so NOTHING is ever
    dropped-by-watermark (the old 8-file random split made drops inherent
    — each file sampled the full time span, so batch 2+ was mostly below
    batch 1's watermark) and the +30d sentinel batch evicts every buffered
    row. Zero drops is now an assertable property, not an accident of
    write timing (ADVICE r8).
    """
    from pyspark.sql import functions as F

    from big_data__instagram_analysis_spark.streaming import harness

    demos: dict[str, dict] = {}

    harness.reset_progress_log()
    views = (
        harness.evict_events_stream(spark, sf_dir)
        .where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            "user_id",
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    purchases = (
        harness.evict_events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    harness.run_available_now(joined, output_mode="append", timeout_s=300)
    # Guarded (ADVICE r8): _record_progress returns without appending when
    # q.recentProgress raises, so a transient progress-API failure must not
    # IndexError the whole metrics run after the expensive query ran.
    demos["stream_stream_join_1h_watermark"] = (
        harness.PROGRESS_LOG[-1] if harness.PROGRESS_LOG else {}
    )

    harness.reset_progress_log()
    agg = (
        harness.evict_events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .count()
    )
    harness.run_available_now(agg, output_mode="append", timeout_s=300)
    demos["tumbling_agg_1h_watermark"] = (
        harness.PROGRESS_LOG[-1] if harness.PROGRESS_LOG else {}
    )
    return demos


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

    # Eviction demos (VERDICT r7 task #3): make boundedness observational.
    demos = run_eviction_demos(spark, args.sf)
    for dn, rec in demos.items():
        traj = rec.get("state_rows_trajectory", [])
        peak = max((t["rows_total"] for t in traj), default=0)
        final = traj[-1]["rows_total"] if traj else 0
        print(
            f"EVICT {dn:32s} peak_state={peak} final_state={final} "
            f"rows_removed={rec.get('rows_removed_total', 0)} "
            f"batches={rec.get('batches')}",
            flush=True,
        )
        if not rec.get("rows_removed_total"):
            print(f"  WARNING: {dn} observed no state eviction", flush=True)
        # With the post-loop single-timestamp mtime stamping, every real row
        # arrives BEFORE the watermark-advancing sentinel batch — nonzero
        # dropped-by-watermark means the replay ordering broke (ADVICE r8).
        if rec.get("rows_dropped_by_watermark", 0):
            print(
                f"  WARNING: {dn} dropped "
                f"{rec['rows_dropped_by_watermark']} rows by watermark — "
                "replay mtime ordering violated, eviction evidence suspect",
                flush=True,
            )

    payload = {
        "metric": "stream_state_metrics",
        "sf_dir": args.sf,
        "queries": results,
        "eviction_demos": demos,
        "eviction_note": (
            "eviction_demos run the mandated shapes (stream-stream "
            "attribution join, tumbling windowed agg) with PRODUCTION "
            "watermarks (1 h) over the events replay extended by two "
            "far-future sentinel batches, so the watermark passes every "
            "buffered row: rows_removed_total > 0 and the "
            "state_rows_trajectory decaying from its peak are the "
            "observed-eviction evidence; the DECLARED join query keeps its "
            "3650-day retain-everything watermark because its sink must "
            "equal the batch join for the DuckDB oracle."
        ),
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
