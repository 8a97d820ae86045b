import sys, gc, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession, functions as F
from big_data__instagram_analysis_spark.io import load
from big_data__instagram_analysis_spark.queries.ops_gates import SB_ALPHA

spark = (SparkSession.builder.master("local[8]").appName("ab-bigram")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

def old_form(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    nminus = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.arrays_zip(F.slice(toks, 1, nminus).alias("w1"), F.slice(toks, 2, nminus).alias("w2"))
    bg = (d.select("source", F.explode(pairs).alias("p"))
          .select("source", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
          .groupBy("source", "w1", "w2").agg(F.count(F.lit(1)).alias("cs")))
    bgt = bg.groupBy("w1", "w2").agg(F.sum("cs").alias("ct"))
    un = d.select("source", F.explode(toks).alias("w"))
    us = un.groupBy("source", "w").agg(F.count(F.lit(1)).alias("us"))
    ut = us.groupBy("w").agg(F.sum("us").alias("ut"))
    ns = us.groupBy("source").agg(F.sum("us").alias("ns"))
    tot = us.agg(F.sum("us").alias("nt"), F.countDistinct("w").alias("v")).collect()[0]
    nt, v = int(tot["nt"]), int(tot["v"])
    scored = (bg.join(bgt.hint("merge"), ["w1", "w2"])
        .join(ut.select(F.col("w").alias("w1"), F.col("ut").alias("ut1")).hint("shuffle_hash"), "w1")
        .join(ut.select(F.col("w").alias("w2"), F.col("ut").alias("ut2")).hint("shuffle_hash"), "w2")
        .join(us.select("source", F.col("w").alias("w1"), F.col("us").alias("us1")).hint("merge"), ["source", "w1"], "left")
        .join(us.select("source", F.col("w").alias("w2"), F.col("us").alias("us2")).hint("merge"), ["source", "w2"], "left")
        .join(F.broadcast(ns), "source")
        .select("source", "cs", (F.col("ct") - F.col("cs")).alias("excl"),
                (F.col("ut1") - F.coalesce("us1", F.lit(0))).alias("c1x"),
                (F.col("ut2") - F.coalesce("us2", F.lit(0))).alias("c2x"),
                (F.lit(nt) - F.col("ns")).alias("nx")))
    score = F.when(F.col("excl") > 0, F.col("excl") / F.col("c1x").cast("double")).otherwise(
        F.lit(SB_ALPHA) * (F.col("c2x") + 1) / (F.col("nx") + F.lit(v)).cast("double"))
    q_micro = F.floor(F.col("cs") * -F.log(score) * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    return (scored.groupBy("source").agg(
        F.sum("cs").cast("long").alias("n_bigram_positions"),
        F.expr("sum(CASE WHEN excl = 0 THEN cs ELSE 0 END) * 1000000 div sum(cs)").alias("backoff_ppm"),
        F.round(F.sum(q_micro) / F.lit(1000000.0) / F.sum("cs"), 4).alias("avg_surprisal"))
        .orderBy("source"))

import __spark_entry__ as entry
new_form = entry.queries()["bigram_backoff_surprisal"]

a = [tuple(r) for r in old_form(spark, sf).collect()]
b = [tuple(r) for r in new_form(spark, sf).collect()]
assert a == b, (a, b)
print("EQUIV OK")
results = {"old": [], "new": []}
for rep in range(4):
    for label, impl in (("old", old_form), ("new", new_form)):
        gc.collect(); spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        impl(spark, sf).toPandas()
        results[label].append(round(time.perf_counter() - t0, 3))
        print(f"rep {rep} {label}: {results[label][-1]}s", flush=True)
print(f"old_min={min(results['old'])} new_min={min(results['new'])}")
