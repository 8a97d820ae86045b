#!/usr/bin/env python
"""Round-13 ABAB: matryoshka_truncation_audit 3-sweep form vs fused 1-sweep.

Old form = three independent cosine_topk_queries sweeps (dims 64/32/16);
new form = _mrl_ranked_sweep (one corpus pass, one window). Alternated in
one session; outputs compared exact first.

Usage: python tools/ab_mrl_r13.py [--sf /root/testdata/sf0.1] [--reps 4]
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
from big_data__instagram_analysis_spark.operators.similarity import (
    cosine_topk_queries,
)
from big_data__instagram_analysis_spark.queries.llm_similarity import (
    MRL_DIMS,
    QUERY_MOD,
    _mrl_ranked_sweep,
)


def _audit_from(trunc, full1, full5):
    in5 = (
        trunc.join(full5, "query_id")
        .where(F.col("neighbor_id") == F.col("n5"))
        .groupBy("dim")
        .agg(F.count(F.lit(1)).alias("n_in5"))
    )
    return (
        trunc.join(full1, "query_id")
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.sum((F.col("neighbor_id") == F.col("full_top1")).cast("long")).alias(
                "n_top1_agree"
            ),
        )
        .join(in5, "dim", "left")
        .select(
            F.col("dim").cast("long").alias("dim"),
            "n_queries",
            "n_top1_agree",
            F.coalesce("n_in5", F.lit(0)).cast("long").alias("n_top1_in_full_top5"),
        )
        .orderBy("dim")
    )


def old_form(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")

    def at_dim(d):
        cols = [F.col("vec_id"), F.expr(f"slice(embedding, 1, {d})").alias("embedding")]
        return emb.select(*cols), emb.where(F.col("vec_id") % QUERY_MOD == 0).select(*cols)

    def top_at(d, k):
        corpus, queries = at_dim(d)
        return cosine_topk_queries(corpus, queries, spark, k=k)

    full_ranked = top_at(64, 5)
    full1 = full_ranked.where(F.col("rank") == 1).select(
        "query_id", F.col("neighbor_id").alias("full_top1")
    )
    full5 = full_ranked.select("query_id", F.col("neighbor_id").alias("n5"))
    trunc = None
    for d in MRL_DIMS[:-1]:
        t = top_at(d, 1).select(F.lit(d).alias("dim"), "query_id", "neighbor_id")
        trunc = t if trunc is None else trunc.unionByName(t)
    return _audit_from(trunc, full1, full5)


def new_form(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    ranked = _mrl_ranked_sweep(spark, emb).localCheckpoint(eager=False)
    fd = MRL_DIMS[-1]
    full1 = ranked.where((F.col("dim") == fd) & (F.col("rank") == 1)).select(
        "query_id", F.col("neighbor_id").alias("full_top1")
    )
    full5 = ranked.where(F.col("dim") == fd).select(
        "query_id", F.col("neighbor_id").alias("n5")
    )
    trunc = ranked.where(F.col("dim") != fd).select("dim", "query_id", "neighbor_id")
    return _audit_from(trunc, full1, full5)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("ab-mrl-r13")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    a = [tuple(r) for r in old_form(spark, args.sf).collect()]
    b = [tuple(r) for r in new_form(spark, args.sf).collect()]
    assert a == b, (a, b)
    print(f"EQUIV OK: {a}")

    impls = {"old3sweep": old_form, "fused": new_form}
    results = {k: [] for k in impls}
    for rep in range(args.reps):
        for label, impl in impls.items():
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            impl(spark, args.sf).toPandas()
            results[label].append(round(time.perf_counter() - t0, 3))
            print(f"rep {rep} {label}: {results[label][-1]}s", flush=True)
    mo, mf = min(results["old3sweep"]), min(results["fused"])
    print(f"matryoshka old_min={mo:.3f}s fused_min={mf:.3f}s "
          f"delta={100 * (mf - mo) / mo:+.1f}%")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
