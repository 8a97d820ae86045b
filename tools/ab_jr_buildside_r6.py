#!/usr/bin/env python
"""Round-6 ABAB: which join_revenue_by_nation physical shape is fastest?

The r5 threshold A/B (ab_join_threshold_r5.py) compared 10 MB vs 4 MB and
saw nothing — but lineitem's pruned-scan size estimate is likely under
4 MB, so BOTH arms planned the same li-broadcast. The executed plan shows
the static planner BROADCASTS LINEITEM (600 k-row hash build) and streams
customer; the hypothesis is that building on the small filtered c⋈o side
and streaming lineitem (the fact-table idiom — what a 100 TB run would do)
is also faster at bench tier.

Arms, interleaved in one warm JVM:
  li_bcast   threshold 10 MB (registered behavior today)
  shuffle    threshold -1: fact joins become shuffle joins (AQE may still
             convert using runtime sizes — that's the point)
  co_bcast   explicit F.broadcast on the c⋈o side, li streamed
"""
from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from big_data__instagram_analysis_spark.io import load
from big_data__instagram_analysis_spark.numeric import cents_sum
from big_data__instagram_analysis_spark.registry import get_specs
from big_data__instagram_analysis_spark.session import enable_bench_tuning, get_spark

SF = "/root/testdata/sf0.1"


def co_bcast_variant(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    asia = n.join(
        F.broadcast(r.where(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    co = (
        c.join(F.broadcast(asia), c.c_nationkey == F.col("n_nationkey"))
        .join(o, c.c_custkey == o.o_custkey)
        .select("n_name", "o_orderkey")
    )
    return (
        li.join(F.broadcast(co), o.o_orderkey == li.l_orderkey)
        .groupBy("n_name")
        .agg(cents_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def main() -> None:
    enable_bench_tuning()
    spark = get_spark("iga-ab-jr")
    spark.sparkContext.setLogLevel("ERROR")
    jr = get_specs()["join_revenue_by_nation"].fn

    def set_thr(v):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(v))
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", str(v))

    arms = {
        "li_bcast": (10485760, jr),
        "shuffle": (-1, jr),
        "co_bcast": (10485760, co_bcast_variant),
    }
    for name, (thr, fn) in arms.items():  # warm twice each
        set_thr(thr)
        fn(spark, SF).toPandas()
        fn(spark, SF).toPandas()

    walls = {n: [] for n in arms}
    order = list(arms.items())
    for rep in range(8):
        for name, (thr, fn) in (order if rep % 2 == 0 else order[::-1]):
            set_thr(thr)
            df = fn(spark, SF)
            t0 = time.perf_counter()
            df.toPandas()
            walls[name].append(time.perf_counter() - t0)
    for name, s in walls.items():
        print(f"{name:10s} min={min(s):.4f} mean={statistics.fmean(s):.4f} stdev={statistics.stdev(s):.4f}")

    # Confirm the arms actually planned differently.
    set_thr(-1)
    p = jr(SF=None, spark=spark) if False else jr(spark, SF)
    p.toPandas()
    txt = p._jdf.queryExecution().executedPlan().toString()
    print("shuffle-arm joins:", [l.strip()[:60] for l in txt.splitlines() if "Join" in l])
    spark.stop()


if __name__ == "__main__":
    main()
