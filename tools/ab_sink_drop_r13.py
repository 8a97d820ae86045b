#!/usr/bin/env python
"""Round-13 ABAB: streaming memory-sink accumulation (VERDICT r12 #6).

Old run_available_now left every memory-sink table registered in the
session catalog for the session's lifetime; new form localCheckpoints the
(small) final rows and drops the temp view. This tool alternates FULL
passes over every declared stream_* query between the two forms in one
session — the accumulation effect is cross-query, so the pass total is
the honest unit.

Usage: python tools/ab_sink_drop_r13.py [--sf /root/testdata/sf0.1] [--reps 3]
"""
from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import big_data__instagram_analysis_spark.queries.streaming as qstream
from big_data__instagram_analysis_spark.streaming.harness import _record_progress, _sink_counter


def run_available_now_old(sdf, *, output_mode: str, timeout_s: int = 120):
    name = f"sg_sink_{next(_sink_counter)}"
    writer = sdf.writeStream.format("memory").queryName(name).outputMode(output_mode)
    q = writer.trigger(availableNow=True).start()
    try:
        q.awaitTermination(timeout_s)
    finally:
        _record_progress(name, q)
        q.stop()
    return sdf.sparkSession.table(name)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("ab-sinkdrop-r13")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    names = sorted(n for n in qs if n.startswith("stream_"))
    print(f"{len(names)} streaming queries")
    new_impl = qstream.run_available_now

    def full_pass() -> float:
        t0 = time.perf_counter()
        for n in names:
            qs[n](spark, args.sf).toPandas()
        return round(time.perf_counter() - t0, 2)

    # one warm pass (new form) for scratch replay dirs + JIT
    full_pass()
    results = {"old": [], "new": []}
    for rep in range(args.reps):
        for label, impl in (("old", run_available_now_old), ("new", new_impl)):
            qstream.run_available_now = impl
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            sec = full_pass()
            results[label].append(sec)
            print(f"rep {rep} {label}: {sec}s", flush=True)
    qstream.run_available_now = new_impl
    mo, mn = min(results["old"]), min(results["new"])
    print(f"stream tail pass: old_min={mo:.2f}s new_min={mn:.2f}s "
          f"delta={100 * (mn - mo) / mo:+.1f}%  all old={results['old']} new={results['new']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
