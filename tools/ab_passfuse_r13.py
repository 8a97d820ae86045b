"""Round-13 batch-2 ABAB: pass-count fusions in six query paths.

Old forms are the committed r13 (pre-change) implementations, inlined
verbatim; new forms come from the live registry. Equivalence is asserted
row-exactly before timing; then 4 alternated reps per query in ONE session
(the PERF.md cross-session-drift rule).
"""
import sys, gc, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession, functions as F
from pyspark.sql.window import Window
from big_data__instagram_analysis_spark.io import load

spark = (SparkSession.builder.master("local[8]").appName("ab-passfuse")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_benchmark_decontamination(spark, sf_dir):
    from big_data__instagram_analysis_spark.operators.dedup import shingle_rows
    d = load(spark, sf_dir, "documents")
    sh = shingle_rows(d, n=4)
    bench = sh.filter(F.col("doc_id") < 5).select("s").distinct()
    cand = sh.filter(F.col("doc_id") >= 5)
    sizes = cand.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    hits = (cand.join(F.broadcast(bench), "s")
            .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_hit")))
    return (sizes.join(hits, "doc_id", "left")
            .select("doc_id", F.col("n_sh").cast("bigint").alias("n_sh"),
                    F.coalesce("n_hit", F.lit(0)).cast("bigint").alias("n_hit"),
                    F.round(F.coalesce("n_hit", F.lit(0)) / F.col("n_sh"), 6).alias("contamination"))
            .filter(F.col("n_hit") > 0)
            .orderBy(F.desc("contamination"), "doc_id"))


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


def old_unigram(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias("term"))
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    total = freq.agg(F.sum("n")).collect()[0][0]
    q_nlp = F.floor(-F.log(F.col("n") / F.lit(float(total))) * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    scored = toks.join(freq, "term").select("doc_id", q_nlp.alias("q_nlp"))
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.round(F.sum("q_nlp") / F.lit(1000000.0) / F.count(F.lit(1)), 4).alias("avg_neg_logprob"))
            .orderBy(F.desc("avg_neg_logprob"), "doc_id").limit(50))


def old_perplexity(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", "source",
                    F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias("term"))
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    total = freq.agg(F.sum("n")).collect()[0][0]
    q_nlp = F.floor(-F.log(F.col("n") / F.lit(float(total))) * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    scored = (toks.join(freq, "term")
              .select("doc_id", "source", q_nlp.alias("q_nlp"))
              .groupBy("doc_id")
              .agg(F.any_value("source").alias("source"),
                   F.round(F.sum("q_nlp") / F.lit(1000000.0) / F.count(F.lit(1)), 4).alias("nlp")))
    dec = F.ntile(10).over(Window.partitionBy("source").orderBy("nlp", "doc_id"))
    kept = F.col("dec").between(2, 9)
    return (scored.withColumn("dec", dec).groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(kept.cast("long")).alias("n_kept"),
                 F.min(F.when(kept, F.col("nlp"))).alias("kept_min_nlp"),
                 F.max(F.when(kept, F.col("nlp"))).alias("kept_max_nlp"))
            .orderBy("source"))


def old_event_pair_pmi(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    ue = e.select("user_id", "event_type").distinct()
    n_users = float(e.select("user_id").distinct().count())
    marg = ue.groupBy("event_type").agg(F.count(F.lit(1)).cast("double").alias("m"))
    a, b = ue.alias("a"), ue.alias("b")
    pairs = (a.join(b, (F.col("a.user_id") == F.col("b.user_id"))
                    & (F.col("a.event_type") < F.col("b.event_type")))
             .groupBy(F.col("a.event_type").alias("ta"), F.col("b.event_type").alias("tb"))
             .agg(F.count(F.lit(1)).cast("double").alias("c")))
    x = marg.select(F.col("event_type").alias("ta"), F.col("m").alias("mx"))
    y = marg.select(F.col("event_type").alias("tb"), F.col("m").alias("my"))
    return (pairs.join(F.broadcast(x), "ta").join(F.broadcast(y), "tb")
            .select("ta", "tb", F.col("c").cast("bigint").alias("n_users"),
                    F.round(F.log((F.col("c") / F.lit(n_users))
                                  / ((F.col("mx") / F.lit(n_users)) * (F.col("my") / F.lit(n_users)))), 6).alias("pmi"))
            .orderBy("ta", "tb"))


def old_hll(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    v = e.where(F.col("event_type") == "view").select("user_id")
    p = e.where(F.col("event_type") == "purchase").select("user_id")
    sk = lambda df: df.agg(F.hll_sketch_agg("user_id").alias("sk"))  # noqa: E731
    est_a = sk(v).select(F.hll_sketch_estimate("sk").alias("ea"))
    est_b = sk(p).select(F.hll_sketch_estimate("sk").alias("eb"))
    est_u = (v.unionByName(p).agg(F.hll_sketch_agg("user_id").alias("sk"))
             .select(F.hll_sketch_estimate("sk").alias("eu")))
    exact_v = v.distinct().count()
    exact_p = p.distinct().count()
    exact_i = v.distinct().join(p.distinct(), "user_id").count()
    est = (est_a.crossJoin(est_b).crossJoin(est_u)
           .select((F.col("ea") + F.col("eb") - F.col("eu")).alias("ei")))
    within = est.select((F.abs(F.col("ei") - F.lit(exact_i))
                         <= F.lit(max(exact_i, 1)) * 0.10).alias("ok"))
    return within.select(
        F.lit(exact_v).cast("bigint").alias("exact_view_users"),
        F.lit(exact_p).cast("bigint").alias("exact_purchase_users"),
        F.lit(exact_i).cast("bigint").alias("exact_intersection"),
        F.col("ok").alias("estimate_within_10pct"))


import __spark_entry__ as entry
qs = entry.queries()
# bm25's in-row-doclen variants both LOST (see tools/ab_bm25_r13.py) and the
# change was reverted; old_bm25 above is kept only as the shape that won.
PAIRS = [
    ("benchmark_decontamination", old_benchmark_decontamination),
    ("unigram_logprob_score", old_unigram),
    ("perplexity_band_prune", old_perplexity),
    ("event_pair_pmi", old_event_pair_pmi),
    ("hll_intersection_estimate", old_hll),
]

for name, old in PAIRS:
    a = [tuple(r) for r in old(spark, sf).collect()]
    b = [tuple(r) for r in qs[name](spark, sf).collect()]
    assert a == b, (name, a[:3], b[:3])
    print(f"EQUIV OK {name} ({len(a)} rows)", flush=True)

out = {}
for name, old in PAIRS:
    results = {"old": [], "new": []}
    for rep in range(4):
        for label, impl in (("old", old), ("new", qs[name])):
            gc.collect(); spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            impl(spark, sf).toPandas()
            results[label].append(round(time.perf_counter() - t0, 3))
    out[name] = results
    print(f"{name}: old={results['old']} new={results['new']} "
          f"old_min={min(results['old'])} new_min={min(results['new'])}", flush=True)
