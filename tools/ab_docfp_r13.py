#!/usr/bin/env python
"""Round-13 A/B: doc_fingerprint interpreted-HOF form vs zip+explode+agg.

The committed form computes md5 per 5-token shingle inside an interpreted
`transform` lambda (zero-shuffle, in-row). The candidate (same class as
r12's bpe_pair_counts win, guide §4.1) builds shingles via arrays_zip of
five shifted slices, explodes, runs ONE codegen'd md5 per row, and takes
min per doc — a partial-aggregated groupBy whose shuffle carries one
16-byte row per (doc, map-partition), i.e. ~|docs| rows, vs the corpus
text the scan already paid. explode_outer keeps short docs (NULL
fingerprint) without a join-back.

Verifies identical output first, then ABAB-alternates in one session.

Usage: python tools/ab_docfp_r13.py [--sf /root/testdata/sf0.1] [--reps 4]
"""
from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from big_data__instagram_analysis_spark.io import load


def docfp_hof(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    hashes = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 4),
        lambda i: F.md5(
            F.encode(F.concat_ws(" ", F.slice(toks, i, F.lit(5))), "UTF-8")
        ),
    )
    return d.select(
        "doc_id",
        F.when(F.size(toks) >= 5, F.array_min(hashes)).alias("fingerprint"),
    )


def docfp_zip(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    ln = F.greatest(F.size(toks) - 4, F.lit(0))
    z = F.arrays_zip(*[F.slice(toks, i + 1, ln) for i in range(5)])
    ex = d.select("doc_id", F.explode_outer(z).alias("z"))
    fp = F.when(
        F.col("z").isNotNull(),
        F.md5(
            F.encode(
                F.concat_ws(" ", *[F.col(f"z.{i}") for i in range(5)]), "UTF-8"
            )
        ),
    )
    return (
        ex.select("doc_id", fp.alias("fp"))
        .groupBy("doc_id")
        .agg(F.min("fp").alias("fingerprint"))
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--equiv-only", action="store_true")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("ab-docfp-r13")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    a = sorted(map(tuple, docfp_hof(spark, args.sf).collect()))
    b = sorted(map(tuple, docfp_zip(spark, args.sf).collect()))
    assert a == b, f"outputs differ: {len(a)} vs {len(b)} rows"
    print(f"EQUIV OK: {len(a)} docs identical")
    if args.equiv_only:
        return 0

    impls = {"hof": docfp_hof, "zip": docfp_zip}
    results = {k: [] for k in impls}
    for impl in impls.values():  # warm both shapes
        impl(spark, args.sf).toPandas()
    for rep in range(args.reps):
        for label, impl in impls.items():
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            impl(spark, args.sf).toPandas()
            sec = round(time.perf_counter() - t0, 3)
            results[label].append(sec)
            print(f"rep {rep} {label}: {sec}s", flush=True)
    mh, mz = min(results["hof"]), min(results["zip"])
    print(f"doc_fingerprint hof_min={mh:.3f}s zip_min={mz:.3f}s "
          f"delta={100 * (mz - mh) / mh:+.1f}%")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
