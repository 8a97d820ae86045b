"""Round-13 tier-2 ABAB: self_join_cohour_pairs (pair join -> C(n,2) closed
form) and countmin_sketch_estimates (per-occurrence grid + second corpus
explode -> one vocab aggregate feeding grid and truth)."""
import sys, gc, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[8]").appName("ab-tier2")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from big_data__instagram_analysis_spark.io import load


def old_cohour(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    hourly = e.select(
        F.date_format("ts", "yyyy-MM-dd").alias("d"),
        F.hour("ts").cast("int").alias("h"), "user_id").distinct()
    a, b = hourly.alias("a"), hourly.alias("b")
    return (a.join(b, (F.col("a.d") == F.col("b.d")) & (F.col("a.h") == F.col("b.h"))
                   & (F.col("a.user_id") < F.col("b.user_id")))
            .groupBy(F.col("a.d").alias("d"), F.col("a.h").alias("h"))
            .agg(F.count(F.lit(1)).alias("n_pairs"))
            .orderBy("d", "h"))


def old_countmin(spark, sf_dir):
    from big_data__instagram_analysis_spark.queries.linalg import (
        _cms_bucket_spark, CMS_DEPTH, CMS_TOPK)
    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias("tok"))
    cells = (toks.select(F.explode(F.array(*[
                F.struct(F.lit(r).alias("r"), _cms_bucket_spark(r, F.col("tok")).alias("b"))
                for r in range(CMS_DEPTH)])).alias("rb"))
             .groupBy(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
             .agg(F.count(F.lit(1)).alias("c")))
    truth = (toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
             .orderBy(F.desc("n"), "tok").limit(CMS_TOPK))
    probes = truth.select("tok", "n", F.explode(F.array(*[
                F.struct(F.lit(r).alias("r"), _cms_bucket_spark(r, F.col("tok")).alias("b"))
                for r in range(CMS_DEPTH)])).alias("rb")) \
        .select("tok", "n", F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    est = (probes.join(F.broadcast(cells), ["r", "b"])
           .groupBy("tok", "n").agg(F.min("c").alias("est")))
    return est.select(F.col("tok").alias("token"),
                      F.col("n").cast("bigint").alias("true_n"),
                      F.col("est").cast("bigint").alias("est_n"),
                      F.expr("(est - n) * 1000000 DIV n").cast("bigint").alias("over_ppm"),
                      (F.col("est") >= F.col("n")).alias("never_undercounts")) \
        .orderBy(F.desc("true_n"), "token")


def old_skew_report(spark, sf_dir):
    from pyspark.sql.window import Window
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")

    def branch(df, name):
        return df.select(F.lit(name).alias("join_key"), F.col(name).alias("k"))

    keyed = (branch(li, "l_orderkey").unionByName(branch(li, "l_partkey"))
             .unionByName(branch(li, "l_suppkey")).unionByName(branch(o, "o_custkey")))
    counts = keyed.groupBy("join_key", "k").agg(F.count(F.lit(1)).alias("n"))
    rn = F.row_number().over(Window.partitionBy("join_key").orderBy(F.desc("n"), F.asc("k")))
    ranked = counts.withColumn("rn", rn)
    return (ranked.groupBy("join_key")
            .agg(F.count(F.lit(1)).alias("n_keys"),
                 F.sum("n").alias("n_rows"),
                 F.max("n").alias("max_per_key"),
                 F.floor(F.max("n") * 1000.0 * F.count(F.lit(1)) / F.sum("n") + F.lit(0.5))
                 .cast("bigint").alias("skew_x1000"),
                 F.max(F.when(F.col("rn") == 1, F.col("k"))).alias("hottest_key"))
            .orderBy("join_key"))


import __spark_entry__ as entry
qs = entry.queries()
PAIRS = [("self_join_cohour_pairs", old_cohour),
         ("countmin_sketch_estimates", old_countmin),
         ("join_key_skew_report", old_skew_report)]

for name, old in PAIRS:
    a = [tuple(r) for r in old(spark, sf).collect()]
    b = [tuple(r) for r in qs[name](spark, sf).collect()]
    assert a == b, (name, a[:3], b[:3])
    print(f"EQUIV OK {name} ({len(a)} rows)", flush=True)

for name, old in PAIRS:
    results = {"old": [], "new": []}
    for rep in range(4):
        for label, impl in (("old", old), ("new", qs[name])):
            gc.collect(); spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            impl(spark, sf).toPandas()
            results[label].append(round(time.perf_counter() - t0, 3))
    print(f"{name}: old={results['old']} new={results['new']} "
          f"old_min={min(results['old'])} new_min={min(results['new'])}", flush=True)
