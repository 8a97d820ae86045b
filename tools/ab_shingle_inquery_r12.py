"""A/B the shingle_rows form INSIDE real queries (r12).

One fresh session; for each named query, alternate ABAB between the old
window-form shingle_rows (monkeypatched) and the new zip form, 3 pairs
each, reporting min per form. Alternation cancels in-session JVM drift —
the single-session profiles disagreed with the isolated noop A/B.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as _W

spark = (
    SparkSession.builder.master("local[8]")
    .appName("ab-shingle-inquery")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import big_data__instagram_analysis_spark.operators.dedup as dedup_mod
from big_data__instagram_analysis_spark.registry import get_specs

SF = "/root/testdata/sf0.1"
new_form = dedup_mod.shingle_rows


def old_form(df, *, text_col="text", id_col="doc_id", n=3):
    """r7-r11 posexplode + lead-window shingle_rows (guard preserved)."""
    sc = df.sparkSession.sparkContext
    files = df.inputFiles()
    must_probe = (len(files) or 1) * 4 < sc.defaultParallelism
    if not must_probe and files:
        try:
            jpath = sc._jvm.org.apache.hadoop.fs.Path(files[0])
            fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
            must_probe = fs.getFileStatus(jpath).getLen() < 4 * 1024 * 1024
        except Exception:
            must_probe = True
    if must_probe and df.rdd.getNumPartitions() * 4 < sc.defaultParallelism:
        df = df.repartition(max(8, sc.defaultParallelism // 2), id_col)
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "t"),
    ).where(F.col("t") != "")
    w = _W.partitionBy("doc").orderBy("pos")
    leads = [F.col("t")] + [F.lead("t", i).over(w) for i in range(1, n)]
    return (
        toks.select(
            "doc",
            F.concat_ws(" ", *leads).alias("s"),
            F.lead("t", n - 1).over(w).alias("_last"),
        )
        .where(F.col("_last").isNotNull())
        .select(F.col("doc").alias(id_col), "s")
        .dropDuplicates([id_col, "s"])
    )


import gc

specs = get_specs()
names = sys.argv[1:] or ["minhash_lsh_dfcap", "dedup_keep_best_survivors",
                         "source_overlap_matrix", "neardup_cc_clusters"]
for name in names:
    fn = specs[name].fn
    # warm both forms once
    for form in (old_form, new_form):
        dedup_mod.shingle_rows = form
        fn(spark, SF).toPandas()
    res = {"old": [], "new": []}
    for _ in range(3):
        for label, form in (("old", old_form), ("new", new_form)):
            dedup_mod.shingle_rows = form
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            fn(spark, SF).toPandas()
            res[label].append(time.perf_counter() - t0)
    dedup_mod.shingle_rows = new_form
    print(
        f"{name}: old min {min(res['old']):.3f}s {[round(t,2) for t in res['old']]}"
        f" | new min {min(res['new']):.3f}s {[round(t,2) for t in res['new']]}"
    )
