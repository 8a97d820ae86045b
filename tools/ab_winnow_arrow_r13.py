#!/usr/bin/env python
"""Round-13 A/B: interpreted-HOF winnow core vs mapInArrow/NumPy core.

VERDICT r12 next-round item #5: the winnow fingerprint core
(`_winnow_selected`) is a zip_with/transform ladder — the right SHAPE
(zero shuffle, in-row) but interpreted per-element lambda arithmetic.
This tool builds the same selection in a mapInArrow kernel (guide
§4.1/§4.2: whole Arrow batches into vectorized NumPy integer ops) and

  1. verifies EXACT equivalence of (doc_id, n_grams, sorted fph multiset)
     at the given SF against the committed HOF form;
  2. ABAB-alternates the two forms inside one session on the three
     consumers (winnow_fingerprints, winnow_match_pairs,
     ingest_neardup_gate), reporting per-rep walls and mins.

Usage:
    python tools/ab_winnow_arrow_r13.py [--sf /root/testdata/sf0.1]
        [--reps 4] [--equiv-only]
"""
from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import big_data__instagram_analysis_spark.queries.llm_text as lt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--equiv-only", action="store_true")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("ab-winnow-r13")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    hof = lt._winnow_selected_hof if hasattr(lt, "_winnow_selected_hof") else None
    arrow = (
        lt._winnow_selected_arrow if hasattr(lt, "_winnow_selected_arrow") else None
    )
    if hof is None or arrow is None:
        print("need both _winnow_selected_hof and _winnow_selected_arrow in llm_text")
        return 2

    # --- equivalence: exact frame compare, fph as sorted list ---------------
    import pyspark.sql.functions as F

    def canon(df):
        return (
            df.select("doc_id", "n_grams", F.sort_array("fph").alias("fph"))
            .orderBy("doc_id")
            .collect()
        )

    a = canon(hof(spark, args.sf))
    b = canon(arrow(spark, args.sf))
    assert len(a) == len(b), (len(a), len(b))
    for ra, rb in zip(a, b):
        assert ra == rb, (ra, rb)
    print(f"EQUIV OK: {len(a)} docs, identical (doc_id, n_grams, fph-set)")
    if args.equiv_only:
        return 0

    # --- ABAB on the consumers ----------------------------------------------
    consumers = ["winnow_fingerprints", "winnow_match_pairs", "ingest_neardup_gate"]
    import __spark_entry__ as entry

    qs = entry.queries()

    def run_all() -> dict:
        out = {}
        for name in consumers:
            t0 = time.perf_counter()
            qs[name](spark, args.sf).toPandas()
            out[name] = round(time.perf_counter() - t0, 3)
        return out

    results = {"hof": [], "arrow": []}
    for rep in range(args.reps):
        for label, impl in (("hof", hof), ("arrow", arrow)):
            lt._winnow_selected = impl
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            results[label].append(run_all())
            print(f"rep {rep} {label}: {results[label][-1]}", flush=True)

    for name in consumers:
        mh = min(r[name] for r in results["hof"])
        ma = min(r[name] for r in results["arrow"])
        print(f"{name:28s} hof_min={mh:7.3f}s arrow_min={ma:7.3f}s "
              f"delta={100 * (ma - mh) / mh:+.1f}%")
    th = min(sum(r.values()) for r in results["hof"])
    ta = min(sum(r.values()) for r in results["arrow"])
    print(f"{'TOTAL':28s} hof_min={th:7.3f}s arrow_min={ta:7.3f}s "
          f"delta={100 * (ta - th) / th:+.1f}%")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
