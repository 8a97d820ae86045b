#!/usr/bin/env python
"""Round-13 clean ABAB for neardup_cc_clusters (VERDICT r12 next-round #3).

r12 left three conflicting protocols for this query (builder ABAB
2.44→1.94 s, committed sweep 2.92→4.66 s, driver warm-min 0.53 s). This
tool produces ONE number with one protocol: same-session alternation of
the r11 shingling (posexplode + lead-window) vs the r12 shingling
(arrays_zip of shifted slices), by monkeypatching
operators.dedup.shingle_rows between reps. It also writes the
before/after formatted plan of the CC INPUT stage (the
ngram_jaccard_pairs frame the star rounds consume) — the part the
committed r12 plans missed, because connected_components executes its
rounds eagerly at query-construction time and the returned DataFrame
only shows the post-CC join.

Usage:
    python tools/ab_neardup_cc_r13.py [--sf /root/testdata/sf0.1]
        [--reps 4] [--plan-dir plans/r13]
"""
from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import big_data__instagram_analysis_spark.operators.dedup as dedup


def shingle_rows_r11(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """The r11 form: posexplode + doc-keyed lead() window (verbatim from
    commit 1a3b031^, minus the shared scan-parallelism guard which both
    forms still run identically in dedup.shingle_rows)."""
    from pyspark.sql.window import Window as _W

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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--plan-dir", default=None)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("ab-neardup-cc-r13")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    fn = entry.queries()["neardup_cc_clusters"]
    r12_impl = dedup.shingle_rows

    if args.plan_dir:
        os.makedirs(args.plan_dir, exist_ok=True)
        from big_data__instagram_analysis_spark.io import load

        d = load(spark, args.sf, "documents")
        for label, impl in (("r11shingle", shingle_rows_r11), ("r12shingle", r12_impl)):
            dedup.shingle_rows = impl
            pairs = dedup.ngram_jaccard_pairs(d, n=3, threshold=0.5).select(
                "doc_a", "doc_b"
            )
            plan = pairs._sc._jvm.PythonSQLUtils.explainString(
                pairs._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(
                args.plan_dir, f"neardup_cc_clusters_ccinput_{label}.txt"
            )
            with open(path, "w") as f:
                f.write(plan)
            print(f"CC-input plan ({label}) -> {path}")
        dedup.shingle_rows = r12_impl

    results = {"r11": [], "r12": []}
    # warm both forms once
    for impl in (shingle_rows_r11, r12_impl):
        dedup.shingle_rows = impl
        fn(spark, args.sf).toPandas()
    for rep in range(args.reps):
        for label, impl in (("r11", shingle_rows_r11), ("r12", r12_impl)):
            dedup.shingle_rows = impl
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            fn(spark, args.sf).toPandas()
            sec = round(time.perf_counter() - t0, 3)
            results[label].append(sec)
            print(f"rep {rep} {label}: {sec}s", flush=True)
    dedup.shingle_rows = r12_impl
    m11, m12 = min(results["r11"]), min(results["r12"])
    print(f"neardup_cc_clusters r11-shingle min={m11:.3f}s "
          f"r12-shingle min={m12:.3f}s delta={100 * (m12 - m11) / m11:+.1f}%")
    print(f"all pairs: r11={results['r11']} r12={results['r12']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
