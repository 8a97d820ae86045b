"""A/B: ngram_novelty_by_source shingle-hash production (r12).

  a — current: in-row transform lambda computing md5 per position
      (interpreted), array_distinct, explode; shuffle carries distinct rows.
  c — same in-row transform for the GRAM STRINGS only (interpreted concat),
      array_distinct, explode, md5 AFTER the explode (codegen).
  b — arrays_zip of 8 shifted slices + explode + codegen md5 +
      dropDuplicates(doc,source,h): all codegen, but one extra exchange.

All produce identical (doc, source, h) sets; final agg identical.
ABAB-interleaved reps on a warm session.
"""
import gc
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[8]")
    .appName("ab-novelty")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from big_data__instagram_analysis_spark.io import load
from big_data__instagram_analysis_spark.queries.ops_gates import (
    MEMORIZED_PPM,
    NOVELTY_W,
)

SF = "/root/testdata/sf0.1"
d = load(spark, SF, "documents")
toks = F.filter(F.split("text", " "), lambda t: t != "")


def sh_a():
    hashes = F.when(
        F.size(toks) >= NOVELTY_W,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (NOVELTY_W - 1)),
                lambda i: F.md5(
                    F.encode(F.concat_ws(" ", F.slice(toks, i, NOVELTY_W)), "UTF-8")
                ),
            )
        ),
    )
    return d.select("doc_id", "source", F.explode(hashes).alias("h"))


def sh_c():
    grams = F.when(
        F.size(toks) >= NOVELTY_W,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (NOVELTY_W - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, NOVELTY_W)),
            )
        ),
    )
    return d.select("doc_id", "source", F.explode(grams).alias("g")).select(
        "doc_id", "source", F.md5(F.encode("g", "UTF-8")).alias("h")
    )


def sh_b():
    ln = F.greatest(F.size(toks) - (NOVELTY_W - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(toks, i + 1, ln) for i in range(NOVELTY_W)])
    return (
        d.select("doc_id", "source", F.explode(z).alias("z"))
        .select(
            "doc_id",
            "source",
            F.md5(
                F.encode(
                    F.concat_ws(" ", *[F.col(f"z.{i}") for i in range(NOVELTY_W)]),
                    "UTF-8",
                )
            ).alias("h"),
        )
        .dropDuplicates(["doc_id", "source", "h"])
    )


def full(sh):
    df = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    perdoc = (
        sh.join(df.hint("merge"), "h")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).alias("n_dup"),
        )
    )
    return (
        perdoc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs_scored"),
            F.sum("n_sh").cast("long").alias("n_shingles"),
            F.sum("n_dup").cast("long").alias("n_duplicated"),
            F.expr("(sum(n_sh) - sum(n_dup)) * 1000000 div sum(n_sh)").alias(
                "novelty_ppm"
            ),
            F.sum(
                F.when(F.expr("n_dup * 1000000 div n_sh") >= MEMORIZED_PPM, 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_docs_memorized"),
        )
        .orderBy("source")
    )


variants = {"a": sh_a, "c": sh_c, "b": sh_b}
for name, fn in variants.items():  # warm all
    full(fn()).write.format("noop").mode("overwrite").save()
res = {k: [] for k in variants}
for _ in range(3):
    for name, fn in variants.items():
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        full(fn()).write.format("noop").mode("overwrite").save()
        res[name].append(time.perf_counter() - t0)
for name in variants:
    print(f"{name}: min {min(res[name]):.3f}s all {[round(t,3) for t in res[name]]}")

base = full(sh_a()).toPandas()
for name in ("b", "c"):
    other = full(variants[name]()).toPandas()
    print(f"{name} identical: {base.equals(other)}")
    assert base.equals(other)
