#!/usr/bin/env python
"""Round-12 streaming-tail A/B (VERDICT r11 task #4).

The sf0.1 sweep's >8 s tail is all streaming micro-batch machinery. PERF
s42 declined generic levers, but the tail has since gained RocksDB,
checkpoint-restart, and statestore-reader rows, and one lever was never
tested: the DRIVER-SIM session runs with the default 200 shuffle
partitions, and every stateful micro-batch commits one state-store
instance PER shuffle partition — ~200 store commits x ~4 micro-batches of
checkpoint files per query, for state that is a few thousand keys.

Arm A: the 5 slowest streaming queries exactly as the driver runs them
       (hostile session: local[8], defaults, non-UTC tz).
Arm B: same session, but spark.sql.shuffle.partitions pinned to 8 before
       the query builds its stream (the RUNTIME_CONF intent applied to
       streaming state; semantics identical — aggregation results do not
       depend on partition count, and each run starts a FRESH checkpoint).

Interleaved ABAB, fresh conf set per rep; reports min/mean per arm per
query and the tail total.
"""
from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

TAIL = [
    "stream_dedup_events",
    "stream_rocksdb_windowed_counts",
    "stream_chained_window_agg",
    "stream_dedup_ttl_watermark",
    "stream_checkpoint_restart",
]

SF = "/root/testdata/sf0.1"


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("ab-stream-tail")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from big_data__instagram_analysis_spark.registry import get_specs

    specs = get_specs()
    default_parts = spark.conf.get("spark.sql.shuffle.partitions")
    print("hostile default shuffle partitions:", default_parts)

    def run(name: str, parts: str | None) -> float:
        if parts is None:
            spark.conf.set("spark.sql.shuffle.partitions", default_parts)
        else:
            spark.conf.set("spark.sql.shuffle.partitions", parts)
        t0 = time.perf_counter()
        specs[name].fn(spark, SF).toPandas()
        return time.perf_counter() - t0

    # warm both arms once (replay dirs, JIT, file-source listing caches)
    for name in TAIL:
        run(name, None)
        run(name, "8")

    walls: dict[tuple[str, str], list[float]] = {}
    for rep in range(4):
        arms = [("A200", None), ("B8", "8")]
        if rep % 2:
            arms.reverse()
        for arm, parts in arms:
            for name in TAIL:
                walls.setdefault((name, arm), []).append(run(name, parts))

    tot = {"A200": 0.0, "B8": 0.0}
    for name in TAIL:
        a = walls[(name, "A200")]
        b = walls[(name, "B8")]
        tot["A200"] += min(a)
        tot["B8"] += min(b)
        print(
            f"{name:32s} A200 min={min(a):6.2f} mean={statistics.fmean(a):6.2f}   "
            f"B8 min={min(b):6.2f} mean={statistics.fmean(b):6.2f}   "
            f"delta={(min(b) - min(a)) / min(a) * 100:+.0f}%"
        )
    print(
        f"tail total (min): A200={tot['A200']:.2f}s  B8={tot['B8']:.2f}s  "
        f"delta={(tot['B8'] - tot['A200']) / tot['A200'] * 100:+.0f}%"
    )
    spark.stop()


if __name__ == "__main__":
    main()
