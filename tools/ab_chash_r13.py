"""Round-13 consistent_hash_rebalance ABAB: three corpus-replaying aggregate
branches (old) vs one pass into a <=17x17 (s_before, s_after) cross-tab (new)."""
import sys, gc, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession, functions as F
from big_data__instagram_analysis_spark.io import load

spark = (SparkSession.builder.master("local[8]").appName("ab-chash")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_form(spark, sf_dir):
    from big_data__instagram_analysis_spark.queries.ops_gates import (
        _RING_BEFORE, _RING_AFTER, CH_SHARDS, CH_NEW)
    d = load(spark, sf_dir, "documents")
    key = F.substring(
        F.md5(F.encode(F.concat(F.lit("doc:"), F.col("doc_id").cast("string")), "UTF-8")),
        1, 16)

    def assign(ring):
        arr = F.array(*[F.lit(e) for e in ring])
        succ = F.array_min(F.filter(arr, lambda x: F.substring(x, 1, 16) >= F.col("k")))
        return F.substring(F.coalesce(succ, F.lit(ring[0])), 18, 2).cast("int")

    asg = d.select(key.alias("k")).select(
        assign(_RING_BEFORE).alias("s_before"), assign(_RING_AFTER).alias("s_after"))
    bef = asg.groupBy(F.col("s_before").alias("shard")).agg(F.count(F.lit(1)).alias("docs_before"))
    aft = asg.groupBy(F.col("s_after").alias("shard")).agg(F.count(F.lit(1)).alias("docs_after"))
    mov = (asg.where(F.col("s_after") != F.col("s_before"))
           .groupBy(F.col("s_after").alias("shard")).agg(F.count(F.lit(1)).alias("moved_in")))
    spine = spark.range(CH_SHARDS + 1).select(F.col("id").cast("int").alias("shard"))
    return (spine.join(F.broadcast(bef), "shard", "left")
            .join(F.broadcast(aft), "shard", "left")
            .join(F.broadcast(mov), "shard", "left")
            .select(F.col("shard").cast("long").alias("shard"),
                    F.coalesce("docs_before", F.lit(0)).cast("long").alias("docs_before"),
                    F.coalesce("docs_after", F.lit(0)).cast("long").alias("docs_after"),
                    F.coalesce("moved_in", F.lit(0)).cast("long").alias("moved_in"),
                    ((F.col("shard") == F.lit(CH_NEW))
                     | (F.coalesce("moved_in", F.lit(0)) == 0)).alias("minimal_movement_ok"))
            .orderBy("shard"))


import __spark_entry__ as entry
new_form = entry.queries()["consistent_hash_rebalance"]

a = [tuple(r) for r in old_form(spark, sf).collect()]
b = [tuple(r) for r in new_form(spark, sf).collect()]
assert a == b, (a, b)
print(f"EQUIV OK ({len(a)} rows)", flush=True)

results = {"old": [], "new": []}
for rep in range(4):
    for label, impl in (("old", old_form), ("new", new_form)):
        gc.collect(); spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        impl(spark, sf).toPandas()
        results[label].append(round(time.perf_counter() - t0, 3))
print(f"old={results['old']} new={results['new']} "
      f"old_min={min(results['old'])} new_min={min(results['new'])}")
