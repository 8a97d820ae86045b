"""Round-13 dedup_governance_rollup ABAB: two-arm endpoint union (old —
replays the pair machinery once per arm unless ReusedExchange saves it) vs
one conditional in-row explode (new)."""
import sys, gc, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession, functions as F
from pyspark.sql.window import Window
from big_data__instagram_analysis_spark.io import load

spark = (SparkSession.builder.master("local[8]").appName("ab-govroll")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_form(spark, sf_dir):
    from big_data__instagram_analysis_spark.operators.dedup import (
        normalize_text, shingle_pair_ppm)
    d = load(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit("")))
    t = d.select("doc_id", "source", n_tok.cast("bigint").alias("n_tok"),
                 F.sha2(F.encode(normalize_text(F.col("text")), "UTF-8"), 256).alias("h"))
    w = Window.partitionBy("h")
    f = t.select("source", "n_tok",
                 (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_surv"))
    kept = F.sum(F.when(F.col("is_surv"), F.col("n_tok")).otherwise(F.lit(0)))
    tot = F.sum("n_tok")
    exact = (f.groupBy("source")
             .agg(F.count(F.lit(1)).cast("bigint").alias("docs_before"),
                  F.sum(F.when(F.col("is_surv"), 1).otherwise(0)).cast("bigint").alias("docs_after"),
                  tot.cast("bigint").alias("tokens_before"),
                  ((tot - kept) * 1000000).cast("bigint").alias("_sav_num"))
             .select("source", "docs_before", "docs_after", "tokens_before",
                     F.expr("_sav_num div nullif(tokens_before, 0)").alias("exact_savings_ppm")))
    src = d.select("doc_id", "source")
    lab = (shingle_pair_ppm(d, n=3).where("is_edge")
           .join(src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")), "doc_a")
           .join(src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")), "doc_b")
           .select("sa", "sb"))
    ends = lab.select(F.col("sa").alias("source"),
                      (F.col("sa") == F.col("sb")).alias("self"),
                      F.col("sb").alias("other")).unionAll(
        lab.where(F.col("sa") != F.col("sb")).select(
            F.col("sb").alias("source"), F.lit(False).alias("self"),
            F.col("sa").alias("other")))
    per_src = ends.groupBy("source").agg(
        F.sum(F.when(F.col("self"), 1).otherwise(0)).cast("bigint").alias("neardup_self_pairs"),
        F.sum(F.when(F.col("self"), 0).otherwise(1)).cast("bigint").alias("neardup_cross_pairs"),
        F.countDistinct(F.when(~F.col("self"), F.col("other"))).cast("bigint").alias("cross_partner_sources"))
    return (exact.join(per_src, "source", "left")
            .select("source", "docs_before", "docs_after", "tokens_before",
                    "exact_savings_ppm",
                    F.coalesce("neardup_self_pairs", F.lit(0)).alias("neardup_self_pairs"),
                    F.coalesce("neardup_cross_pairs", F.lit(0)).alias("neardup_cross_pairs"),
                    F.coalesce("cross_partner_sources", F.lit(0)).alias("cross_partner_sources"))
            .orderBy("source"))


import __spark_entry__ as entry
new_form = entry.queries()["dedup_governance_rollup"]

a = [tuple(r) for r in old_form(spark, sf).collect()]
b = [tuple(r) for r in new_form(spark, sf).collect()]
assert a == b, (a[:3], b[:3])
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
