#!/usr/bin/env python
"""A/B: did the round-4 cents-quantization rewrite slow the headline bench?

VERDICT r4 "What's wrong #2": concurrent whole-set regressed 0.695->0.790 s
r3->r4 with no recorded cause; the cents rewrite (floor(x*100+0.5) BIGINT
sums replacing round(sum(double),2)) touched pricing_summary,
join_revenue_by_nation and rollup_qty among the headline ten and was one of
two suspects (the other: environment drift, which PERF S32's own variance
study sized at 3.3-4.1 s across identical configs).

Method (the S32 experiment-design note): interleaved ABAB reps inside ONE
warm JVM, so JIT warmth and machine drift hit both variants equally. Variant
A = the registered (cents) queries; variant B = faithful r3-style rewrites
with round(sum(double),2) in place of the cents sums, identical otherwise.
Prints per-query min/mean for both and the delta.
"""
from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data__instagram_analysis_spark.io import load
from big_data__instagram_analysis_spark.registry import get_specs
from big_data__instagram_analysis_spark.session import enable_bench_tuning, get_spark

SF_DIR = "/root/testdata/sf0.1"
NAMES = ["pricing_summary", "join_revenue_by_nation", "rollup_qty"]


def pricing_summary_r3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered shape verbatim, with the three cents sums as round(sum)."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.to_date("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def join_revenue_r3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered shape verbatim, with the cents revenue sum as round(sum)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    asia_nations = n.join(
        F.broadcast(r.where(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    return (
        c.join(F.broadcast(asia_nations), c.c_nationkey == F.col("n_nationkey"))
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


def rollup_qty_r3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered shape verbatim (rollup_qty's sums are qty, not cents —
    included as the no-cents-change control)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "cnt")
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


R3 = {
    "pricing_summary": pricing_summary_r3,
    "join_revenue_by_nation": join_revenue_r3,
    "rollup_qty": rollup_qty_r3,
}


def main() -> None:
    enable_bench_tuning()
    spark = get_spark("iga-ab-cents")
    spark.sparkContext.setLogLevel("ERROR")
    specs = get_specs()

    # warm both variants
    for _ in range(3):
        for n in NAMES:
            specs[n].fn(spark, SF_DIR).toPandas()
            R3[n](spark, SF_DIR).toPandas()

    reps = 9
    samples: dict[tuple[str, str], list[float]] = {}
    for rep in range(reps):
        order = ["A", "B"] if rep % 2 == 0 else ["B", "A"]
        for variant in order:
            for n in NAMES:
                df = specs[n].fn(spark, SF_DIR) if variant == "A" else R3[n](spark, SF_DIR)
                t0 = time.perf_counter()
                df.toPandas()
                samples.setdefault((n, variant), []).append(time.perf_counter() - t0)

    print(f"{'query':28s} {'cents_min':>9s} {'r3_min':>9s} {'cents_mean':>10s} {'r3_mean':>9s} {'d_mean%':>8s}")
    for n in NAMES:
        a, b = samples[(n, "A")], samples[(n, "B")]
        ma, mb = statistics.fmean(a), statistics.fmean(b)
        print(
            f"{n:28s} {min(a):9.4f} {min(b):9.4f} {ma:10.4f} {mb:9.4f} "
            f"{100 * (ma - mb) / mb:7.1f}%"
        )
    spark.stop()


if __name__ == "__main__":
    main()
