#!/usr/bin/env python
"""Round-6 follow-up: does the fact-streaming join_revenue shape need the
forced broadcast, or does AQE pick the c⋈o build side on its own?

Arms (interleaved, one warm JVM):
  registered  today's shape (c⋈o probes a broadcast-built lineitem)
  co_hint     li.join(F.broadcast(co)) — fastest in ab_jr_buildside_r6 but
              a forced broadcast of an unbounded side (scale-killer hint)
  co_nohint   li.join(co) with NO hint — the scale-honest declaration;
              pass iff AQE builds on co at runtime and the time matches
              co_hint.
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


def _co(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    asia = n.join(
        F.broadcast(r.where(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    return (
        c.join(F.broadcast(asia), c.c_nationkey == F.col("n_nationkey"))
        .join(o, c.c_custkey == o.o_custkey)
        .select("n_name", "o_orderkey")
    )


def _finish(li, co, hint):
    side = F.broadcast(co) if hint else co
    return (
        li.join(side, co.o_orderkey == li.l_orderkey)
        .groupBy("n_name")
        .agg(cents_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def co_hint(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    co = _co(spark, sf_dir)
    return _finish(li, co, True)


def co_nohint(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    co = _co(spark, sf_dir)
    return _finish(li, co, False)


def main() -> None:
    enable_bench_tuning()
    spark = get_spark("iga-ab-jr2")
    spark.sparkContext.setLogLevel("ERROR")
    arms = {
        "registered": get_specs()["join_revenue_by_nation"].fn,
        "co_hint": co_hint,
        "co_nohint": co_nohint,
    }
    for fn in arms.values():
        fn(spark, SF).toPandas()
        fn(spark, SF).toPandas()
    walls = {n: [] for n in arms}
    order = list(arms.items())
    for rep in range(8):
        for name, fn in (order if rep % 2 == 0 else order[::-1]):
            df = fn(spark, SF)
            t0 = time.perf_counter()
            df.toPandas()
            walls[name].append(time.perf_counter() - t0)
    for name, s in walls.items():
        print(f"{name:10s} min={min(s):.4f} mean={statistics.fmean(s):.4f} stdev={statistics.stdev(s):.4f}")

    p = co_nohint(spark, SF)
    p.toPandas()
    txt = p._jdf.queryExecution().executedPlan().toString()
    for l in txt.splitlines():
        if "Join" in l or "Exchange" in l:
            print(l.strip()[:110])
    spark.stop()


if __name__ == "__main__":
    main()
