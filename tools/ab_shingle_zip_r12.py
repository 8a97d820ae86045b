"""A/B: shingle_rows window form vs arrays_zip in-row form (r12).

The window form (posexplode + lead over a doc-keyed window) was adopted in
r7 because the transform/element_at HOF chain is interpreted and slow. The
zip form (arrays_zip of n shifted slices + explode) is codegen-friendly
bulk array work with NO window, NO sort, and partition-local dedup — if it
matches the window form's speed it is strictly better at scale (shuffles
distinct shingles instead of all tokens).

Times the raw shingle production AND one real consumer chain
(sizes + SHJ self-join pair counts, the shingle_pair_ppm shape) at sf0.1.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[8]")
    .appName("ab-shingle-zip")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from big_data__instagram_analysis_spark.io import load
from big_data__instagram_analysis_spark.operators.dedup import shingle_rows

SF = "/root/testdata/sf0.1"
d = load(spark, SF, "documents")
N = 3


def zip_shingles(df, text_col="text", id_col="doc_id", n=3):
    sc = df.sparkSession.sparkContext
    files = df.inputFiles()
    if (len(files) or 1) * 4 < sc.defaultParallelism and (
        df.rdd.getNumPartitions() * 4 < sc.defaultParallelism
    ):
        df = df.repartition(max(8, sc.defaultParallelism // 2), id_col)
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    ln = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(toks, i + 1, ln) for i in range(n)])
    return (
        df.select(F.col(id_col), F.explode(z).alias("z"))
        .select(
            id_col,
            F.concat_ws(" ", *[F.col(f"z.{i}") for i in range(n)]).alias("s"),
        )
        .dropDuplicates([id_col, "s"])
    )


def consumer(sh):
    sh = sh.localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "s")
    b = sh.select(F.col("doc_id").alias("doc_b"), "s")
    shared = (
        a.join(b.hint("shuffle_hash"), "s")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return shared.join(
        sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")),
        "doc_a",
    )


variants = {
    "window": lambda: shingle_rows(d, n=N),
    "zip": lambda: zip_shingles(d, n=N),
}
for name, fn in variants.items():
    fn().write.format("noop").mode("overwrite").save()  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    print(f"shingles {name}: min {min(ts):.3f}s all {[round(t,3) for t in ts]}")

for name, fn in variants.items():
    consumer(fn()).write.format("noop").mode("overwrite").save()  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        consumer(fn()).write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    print(f"consumer {name}: min {min(ts):.3f}s all {[round(t,3) for t in ts]}")

a = set(map(tuple, shingle_rows(d, n=N).collect()))
b = set(map(tuple, zip_shingles(d, n=N).collect()))
print("identical shingle sets:", a == b, len(a), len(b))
assert a == b
