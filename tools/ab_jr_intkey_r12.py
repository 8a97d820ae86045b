#!/usr/bin/env python
"""Round-12 A/B for join_revenue_by_nation (VERDICT r11 task #1).

The paired datapath has sat ~4.5x the 0.089 s DuckDB denominator for three
rounds, attributed to exchange serialization two stages deep (PERF s57).
Arms attack the exchange payload and the agg key width:

  registered   today's shape: co carries n_name (string) through the
               o_orderkey exchange; final agg groups by string.
  intkey       co carries n_nationkey (int) instead; agg groups by int;
               the 25-row nationkey->name map broadcast-joins AFTER the
               agg (25 rows), so no string ever rides an exchange.
  intkey_pa    intkey + map-side partial agg of li cents by l_orderkey
               BEFORE the exchange (the r10 cents-pre-agg re-test the
               judge asked for, on top of the int-key shape).
  minproj      registered but with c/o/li pre-projected to exactly the
               join/agg columns before any join (does explicit pruning
               beat Catalyst's?).

Interleaved ABAB on one warm JVM, 10 reps, min/mean/stdev per arm.
"""
from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from big_data__instagram_analysis_spark.io import load
from big_data__instagram_analysis_spark.numeric import cents, cents_sum
from big_data__instagram_analysis_spark.registry import get_specs
from big_data__instagram_analysis_spark.session import enable_bench_tuning, get_spark

SF = "/root/testdata/sf0.1"


def _asia(spark, sf_dir):
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return n.join(
        F.broadcast(r.where(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")


def intkey(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    asia = _asia(spark, sf_dir)
    co = (
        c.join(
            F.broadcast(asia.select("n_nationkey")),
            c.c_nationkey == F.col("n_nationkey"),
        )
        .join(o, c.c_custkey == o.o_custkey)
        .select("n_nationkey", "o_orderkey")
    )
    rev = (
        li.join(co.hint("shuffle_hash"), co.o_orderkey == li.l_orderkey)
        .groupBy("n_nationkey")
        .agg(
            cents_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )
    return (
        rev.join(F.broadcast(_asia(spark, sf_dir)), "n_nationkey")
        .select("n_name", "revenue")
        .orderBy(F.desc("revenue"), "n_name")
    )


def intkey_pa(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    asia = _asia(spark, sf_dir)
    co = (
        c.join(
            F.broadcast(asia.select("n_nationkey")),
            c.c_nationkey == F.col("n_nationkey"),
        )
        .join(o, c.c_custkey == o.o_custkey)
        .select("n_nationkey", "o_orderkey")
    )
    li_pa = li.groupBy("l_orderkey").agg(
        F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "rev_cents"
        )
    )
    rev = (
        li_pa.join(co.hint("shuffle_hash"), co.o_orderkey == li_pa.l_orderkey)
        .groupBy("n_nationkey")
        .agg((F.sum("rev_cents") / 100.0).alias("revenue"))
    )
    return (
        rev.join(F.broadcast(_asia(spark, sf_dir)), "n_nationkey")
        .select("n_name", "revenue")
        .orderBy(F.desc("revenue"), "n_name")
    )


def minproj(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    asia = _asia(spark, sf_dir)
    co = (
        c.join(F.broadcast(asia), c.c_nationkey == F.col("n_nationkey"))
        .join(o, c.c_custkey == o.o_custkey)
        .select("n_name", "o_orderkey")
    )
    return (
        li.join(co.hint("shuffle_hash"), co.o_orderkey == li.l_orderkey)
        .groupBy("n_name")
        .agg(
            cents_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


def main() -> None:
    enable_bench_tuning()
    spark = get_spark("iga-ab-jr12")
    spark.sparkContext.setLogLevel("ERROR")
    arms = {
        "registered": get_specs()["join_revenue_by_nation"].fn,
        "intkey": intkey,
        "intkey_pa": intkey_pa,
        "minproj": minproj,
    }
    # Parity first: every arm must give the registered answer.
    ref = arms["registered"](spark, SF).toPandas()
    for name, fn in arms.items():
        got = fn(spark, SF).toPandas()
        assert list(got["n_name"]) == list(ref["n_name"]) and all(
            abs(a - b) < 1e-9 for a, b in zip(got["revenue"], ref["revenue"])
        ), f"parity broke in arm {name}"
    walls = {n: [] for n in arms}
    order = list(arms.items())
    for rep in range(10):
        for name, fn in (order if rep % 2 == 0 else order[::-1]):
            df = fn(spark, SF)
            t0 = time.perf_counter()
            df.toPandas()
            walls[name].append(time.perf_counter() - t0)
    for name, s in walls.items():
        print(
            f"{name:10s} min={min(s):.4f} mean={statistics.fmean(s):.4f} "
            f"stdev={statistics.stdev(s):.4f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
