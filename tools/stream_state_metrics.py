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
    "stream_stateful_user_counter",
    "stream_watermark_tumbling",
    "stream_stream_left_outer",
    "stream_stream_full_outer",
]


def build_evict_replay(spark, sf_dir: str, n_files: int = 8) -> str:
    """Events replay dir extended with two far-future sentinel batches.

    The declared stream-stream join query retains everything by design
    (3650-day watermark keeps its sink equal to the batch join, which is
    what makes it oracle-checkable), so its boundedness evidence needs a
    separate replay where the watermark actually PASSES the buffered rows
    (VERDICT r7 task #3). Sentinels: one view + one purchase event at
    max(ts)+30d and +60d, each its own part file with the newest mtimes so
    the file source (mtime-ordered) delivers them last — the +30d batch
    advances the watermark past all real data, and the +60d batch gives the
    state store a processing turn AFTER that advance, so eviction is
    observable even if no empty finalization batch runs.
    """
    from pyspark.sql import functions as F

    from big_data__instagram_analysis_spark.io import load, scratch_dir

    key = hashlib.sha256(
        f"{os.path.abspath(sf_dir)}|evict|{n_files}".encode()
    ).hexdigest()[:12]
    edir = scratch_dir(f"stream_evict_{key}")
    marker = os.path.join(edir, "_SPARK_GRAFT_READY")
    if not os.path.exists(marker):
        batch = load(spark, sf_dir, "events")
        batch.repartition(n_files).write.mode("overwrite").parquet(edir)
        base_parts = sorted(glob.glob(os.path.join(edir, "part-*.parquet")))
        mx = batch.agg(F.max("ts").alias("m")).collect()[0]["m"]
        seen = set(base_parts)
        for days in (30, 60):
            one = (
                batch.where(F.col("event_type") == "view").limit(1)
            ).unionByName(
                batch.where(F.col("event_type") == "purchase").limit(1)
            )
            sent = (
                one.withColumn(
                    "ts", F.lit(mx) + F.expr(f"INTERVAL {days} DAYS")
                )
                .withColumn("ts_ns", F.unix_micros(F.col("ts")) * 1000)
                .select(*batch.columns)
            )
            sent.coalesce(1).write.mode("append").parquet(edir)
            new = sorted(
                set(glob.glob(os.path.join(edir, "part-*.parquet"))) - seen
            )
            seen.update(new)
            now = time.time()
            for p in base_parts:
                os.utime(p, (now - 600, now - 600))
            for p in new:
                os.utime(p, (now - 600 + days, now - 600 + days))
        with open(marker, "w") as fh:
            fh.write("ok")
    return edir


def _evict_reader(spark, sf_dir: str, edir: str):
    from big_data__instagram_analysis_spark.io import load

    schema = load(spark, sf_dir, "events").schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(edir)
    )


def run_eviction_demos(spark, sf_dir: str) -> dict[str, dict]:
    """The two mandated shapes with PRODUCTION watermarks over the extended
    replay: the attribution join (1 h watermark vs its 30-min range bound)
    and the tumbling windowed agg (10-min windows, 1 h watermark, append)."""
    from pyspark.sql import functions as F

    from big_data__instagram_analysis_spark.streaming import harness

    edir = build_evict_replay(spark, sf_dir)
    demos: dict[str, dict] = {}

    harness.reset_progress_log()
    views = (
        _evict_reader(spark, sf_dir, edir)
        .where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            "user_id",
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    purchases = (
        _evict_reader(spark, sf_dir, edir)
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
    demos["stream_stream_join_1h_watermark"] = harness.PROGRESS_LOG[-1]

    harness.reset_progress_log()
    agg = (
        _evict_reader(spark, sf_dir, edir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .count()
    )
    harness.run_available_now(agg, output_mode="append", timeout_s=300)
    demos["tumbling_agg_1h_watermark"] = harness.PROGRESS_LOG[-1]
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
