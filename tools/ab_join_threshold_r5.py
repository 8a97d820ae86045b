#!/usr/bin/env python
"""ABAB: broadcast vs shuffle for join_revenue_by_nation's fact join, plus
from_json vs parse_json/variant_get for json_extract_k. One warm JVM,
runtime-settable confs toggled per rep."""
from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from big_data__instagram_analysis_spark.io import load
from big_data__instagram_analysis_spark.registry import get_specs
from big_data__instagram_analysis_spark.session import enable_bench_tuning, get_spark

SF = "/root/testdata/sf0.1"


def main() -> None:
    enable_bench_tuning()
    spark = get_spark("iga-ab-join")
    spark.sparkContext.setLogLevel("ERROR")
    specs = get_specs()
    jr = specs["join_revenue_by_nation"].fn

    def set_thr(v: str) -> None:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)

    # warm both
    for thr in ("10485760", "4194304") * 2:
        set_thr(thr)
        jr(spark, SF).toPandas()

    samples = {"bcast10m": [], "bcast4m": []}
    for rep in range(8):
        pairs = [("bcast10m", "10485760"), ("bcast4m", "4194304")]
        if rep % 2:
            pairs.reverse()
        for label, thr in pairs:
            set_thr(thr)
            df = jr(spark, SF)
            t0 = time.perf_counter()
            df.toPandas()
            samples[label].append(time.perf_counter() - t0)
    set_thr("10485760")

    def js_variant(s, d):
        e = load(s, d, "events")
        return (
            e.select(
                F.try_variant_get(F.parse_json("props"), "$.k", "int").alias("k")
            )
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("k")
        )

    js = specs["json_extract_k"].fn
    for _ in range(2):
        js(spark, SF).toPandas()
        js_variant(spark, SF).toPandas()
    samples["js_fromjson"] = []
    samples["js_variant"] = []
    for rep in range(8):
        pairs = [("js_fromjson", js), ("js_variant", js_variant)]
        if rep % 2:
            pairs.reverse()
        for label, fn in pairs:
            df = fn(spark, SF)
            t0 = time.perf_counter()
            df.toPandas()
            samples[label].append(time.perf_counter() - t0)

    for label, s in samples.items():
        print(f"{label:12s} min={min(s):.4f} mean={statistics.fmean(s):.4f} stdev={statistics.stdev(s):.4f}")
    spark.stop()


if __name__ == "__main__":
    main()
