"""A/B: adjacent-pair generation shapes for bpe_pair_counts (r12).

Variants over sf0.1 documents (5k docs, ~270k tokens), timed with the noop
sink after a warmup pass:
  hof      — current: transform(sequence, i -> concat_ws(element_at...))
  zip      — arrays_zip(slice(t,1,n-1), slice(t,2,n-1)) + explode, concat after
  window   — posexplode + lead over doc-keyed window (shingle_rows shape)
Each produces identical (doc_id, pair) rows; asserted once at the end.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

spark = (
    SparkSession.builder.master("local[8]")
    .appName("ab-hof-pairs")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from big_data__instagram_analysis_spark.io import load

SF = "/root/testdata/sf0.1"
d = load(spark, SF, "documents")
toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")


def hof():
    pairs_arr = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )
    return d.select(
        "doc_id",
        F.explode(
            F.when(F.size(toks) >= 2, pairs_arr).otherwise(
                F.array().cast("array<string>")
            )
        ).alias("pair"),
    )


def zipv():
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    z = F.arrays_zip(F.slice(toks, 1, n1), F.slice(toks, 2, n1))
    return d.select("doc_id", F.explode(z).alias("z")).select(
        "doc_id", F.concat_ws(" ", F.col("z.0"), F.col("z.1")).alias("pair")
    )


def window():
    ex = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("p", "t")
    ).where(F.col("t") != "")
    w = Window.partitionBy("doc_id").orderBy("p")
    nxt = F.lead("t").over(w)
    return ex.select(
        "doc_id", F.concat_ws(" ", F.col("t"), nxt).alias("pair"), nxt.alias("_n")
    ).where(F.col("_n").isNotNull()).select("doc_id", "pair")


def agg(df):
    return (
        df.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("doc_id").alias("n_docs"))
        .orderBy(F.desc("n"), "pair")
        .limit(50)
    )


variants = {"hof": hof, "zip": zipv, "window": window}
for name, fn in variants.items():
    agg(fn()).write.format("noop").mode("overwrite").save()  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        agg(fn()).write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    print(f"{name}: min {min(ts):.3f}s all {[round(t,3) for t in ts]}")

base = agg(hof()).toPandas()
for name in ("zip", "window"):
    other = agg(variants[name]()).toPandas()
    same = base.equals(other)
    print(f"{name} identical to hof: {same}")
    assert same, name
