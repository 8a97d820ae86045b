#!/usr/bin/env python
"""Round-8 profile of curation_pipeline (VERDICT r7 task #1).

Times the full query at sf0.1 plus each internal stage in isolation
(quality gate, exact dedup, jaccard pairs, CC rounds, final packing) and
counts Spark jobs per segment, so the de-weak surgery targets the measured
hot spot instead of a guess.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from big_data__instagram_analysis_spark.session import enable_bench_tuning, get_spark

enable_bench_tuning()
spark = get_spark("curation-profile")
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

SF = "/root/testdata/sf0.1"

from big_data__instagram_analysis_spark.queries.curation import curation_pipeline


def jobs() -> int:
    return sc._jsc.sc().statusTracker().getJobIdsForGroup(None).length if False else len(
        sc.statusTracker().getJobIdsForGroup()
    )


def timed(label, fn, reps=3):
    fn()  # warm
    best = None
    for _ in range(reps):
        j0 = jobs()
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        nj = jobs() - j0
        best = (dt, nj) if best is None or dt < best[0] else best
    print(f"{label:35s} {best[0]:7.3f}s  jobs={best[1]}")
    return best


# --- full query ---
timed("FULL curation_pipeline", lambda: curation_pipeline(spark, SF).toPandas())

# --- stage isolation (mirrors the query body) ---
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from big_data__instagram_analysis_spark.io import load
from big_data__instagram_analysis_spark.operators.dedup import (
    exact_dedup,
    ngram_jaccard_pairs,
)
from big_data__instagram_analysis_spark.operators.graph import attach_components

d = load(spark, SF, "documents")
toks = F.filter(F.split("text", " "), lambda t: t != "")
with_toks = d.withColumn("t", toks)
q = with_toks.where(
    F.col("n_chars").between(150, 400)
    & (F.size("t") >= 25)
    & (F.size(F.array_distinct("t")) / F.size("t") >= 0.3)
)
timed("quality gate q.count", lambda: q.count())
survivors = exact_dedup(q, text_col="text", id_col="doc_id").select("doc_id")
timed("exact_dedup survivors", lambda: survivors.toPandas())
s = q.join(survivors, "doc_id")
timed("s (q join survivors)", lambda: s.select("doc_id").toPandas())
pairs = ngram_jaccard_pairs(s, n=3, threshold=0.5).select("doc_a", "doc_b")
timed("ngram_jaccard_pairs", lambda: pairs.toPandas())
n_pairs = pairs.count()
print("  n_pairs =", n_pairs, " n_survivors =", s.count(), " n_docs =", d.count())

timed(
    "attach_components(s, pairs)",
    lambda: attach_components(
        s.select("doc_id"), pairs, "doc_id", src="doc_a", dst="doc_b"
    ).toPandas(),
)
