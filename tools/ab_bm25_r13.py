"""Round-13 bm25_rational_topdocs ABAB: explode+groupBy doclen (old) vs
in-row regexp_count doclen (new). The first in-row attempt
(F.filter(lambda)+size) measured 30% SLOWER than old — interpreted HOF;
this is the codegen regex form."""
import sys, gc, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[8]").appName("ab-bm25")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_bm25(spark, sf_dir):
    from big_data__instagram_analysis_spark.queries.retrieval import (
        _tokens, _BM25_TERMS, _K1, _B)
    tok = _tokens(spark, sf_dir)
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("doclen"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"), F.sum("doclen").alias("total_len"))
    tf = (tok.where(F.col("term").isin(*_BM25_TERMS))
          .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    term_score = ((F.col("tf") * (_K1 + 1.0))
                  / (F.col("tf") + _K1 * (1.0 - _B + _B * F.col("doclen") / avgdl))
                  * (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    return (tf.join(F.broadcast(df), "term").join(dl, "doc_id")
            .crossJoin(F.broadcast(stats))
            .groupBy("doc_id").agg(F.round(F.sum(term_score), 6).alias("score"))
            .orderBy(F.desc("score"), "doc_id").limit(20))


import __spark_entry__ as entry
new_bm25 = entry.queries()["bm25_rational_topdocs"]

a = [tuple(r) for r in old_bm25(spark, sf).collect()]
b = [tuple(r) for r in new_bm25(spark, sf).collect()]
assert a == b, (a[:3], b[:3])
print(f"EQUIV OK ({len(a)} rows)", flush=True)

results = {"old": [], "new": []}
for rep in range(4):
    for label, impl in (("old", old_bm25), ("new", new_bm25)):
        gc.collect(); spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        impl(spark, sf).toPandas()
        results[label].append(round(time.perf_counter() - t0, 3))
        print(f"rep {rep} {label}: {results[label][-1]}s", flush=True)
print(f"old_min={min(results['old'])} new_min={min(results['new'])}")
