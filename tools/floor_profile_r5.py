#!/usr/bin/env python
"""Round-5 ablation profile of the heavy headline queries.

Where does the sequential sf0.1 wall actually go for the three biggest
contributors (join_revenue_by_nation 0.70 s, json_extract_k 0.45 s,
events_hourly 0.48 s)? Each ablation removes one plan component; min-of-5
walls in one warm JVM, interleaved per query.
"""
from __future__ import annotations

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
    spark = get_spark("iga-profile")
    spark.sparkContext.setLogLevel("ERROR")
    specs = get_specs()

    def jr_full(s, d):
        return specs["join_revenue_by_nation"].fn(s, d)

    def jr_no_sort(s, d):
        df = jr_full(s, d)
        return df.sparkSession.createDataFrame(df.rdd, df.schema) if False else df.limit(10**9)

    def jr_scan_only(s, d):
        li = load(s, d, "lineitem")
        return li.agg(F.count(F.lit(1)).alias("n"))

    def jr_one_join(s, d):
        o = load(s, d, "orders")
        li = load(s, d, "lineitem")
        return (
            o.join(li, o.o_orderkey == li.l_orderkey)
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def js_full(s, d):
        return specs["json_extract_k"].fn(s, d)

    def js_scan(s, d):
        e = load(s, d, "events")
        return e.select("props").agg(F.count(F.lit(1)).alias("n"))

    def js_parse_only(s, d):
        e = load(s, d, "events")
        return e.select(
            F.from_json("props", "k INT").getField("k").alias("k")
        ).agg(F.sum("k").alias("n"))

    def js_getjson(s, d):
        e = load(s, d, "events")
        return (
            e.select(F.get_json_object("props", "$.k").cast("int").alias("k"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("k")
        )

    def ev_full(s, d):
        return specs["events_hourly"].fn(s, d)

    def ev_no_datefmt(s, d):
        e = load(s, d, "events")
        return (
            e.groupBy(
                "user_id",
                "event_type",
                (F.col("ts_ns") / F.lit(86_400 * 10**9)).cast("int").alias("event_date"),
                F.hour("ts").cast("int").alias("event_hour"),
            )
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
            .orderBy(F.desc("n"), "user_id", "event_type", "event_date", "event_hour")
            .limit(100)
        )

    def ev_scan(s, d):
        e = load(s, d, "events")
        return e.select("user_id", "event_type", "ts", "value").agg(
            F.count(F.lit(1)).alias("n")
        )

    variants = {
        "jr_full": jr_full,
        "jr_scan_only": jr_scan_only,
        "jr_one_join": jr_one_join,
        "js_full": js_full,
        "js_scan": js_scan,
        "js_parse_only": js_parse_only,
        "js_getjson": js_getjson,
        "ev_full": ev_full,
        "ev_no_datefmt": ev_no_datefmt,
        "ev_scan": ev_scan,
    }
    for name, fn in variants.items():  # warm
        fn(spark, SF).toPandas()
        fn(spark, SF).toPandas()
    walls = {n: [] for n in variants}
    for _ in range(5):
        for name, fn in variants.items():
            df = fn(spark, SF)
            t0 = time.perf_counter()
            df.toPandas()
            walls[name].append(time.perf_counter() - t0)
    for name in variants:
        print(f"{name:16s} min={min(walls[name]):.4f} mean={sum(walls[name])/5:.4f}")
    # Which joins did AQE leave as shuffle joins?
    plan = jr_full(spark, SF)
    plan.toPandas()
    print(plan._jdf.queryExecution().executedPlan().toString()[:3000])
    spark.stop()


if __name__ == "__main__":
    main()
