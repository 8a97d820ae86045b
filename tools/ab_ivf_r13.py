"""Round-13 ann_ivf_probe ABAB: corpus cell-routing join-back (old — route
emits (vec_id, cell), then emb.join(cells, "vec_id") re-attaches the
embedding via a corpus shuffle) vs carrying the embedding through the Arrow
route pass (new — zero join). Rows are asserted identical on the raw probe
surface (query_id, neighbor_id, sim, rank)."""
import sys, gc, time, os
from typing import Iterator
import numpy as np
import pandas as pd
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[8]").appName("ab-ivf")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from big_data__instagram_analysis_spark.io import load
from big_data__instagram_analysis_spark.queries.llm_similarity import (
    _ivf_train_centroids, _ivf_probe_rows, QUERY_MOD, TOPK)


def old_probe_rows(spark, sf_dir):
    from pyspark.sql.window import Window
    emb = load(spark, sf_dir, "embeddings")
    bc = spark.sparkContext.broadcast(_ivf_train_centroids(emb))

    def route(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cent = bc.value
        for b in batches:
            if b.empty:
                continue
            m = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            yield pd.DataFrame({"vec_id": b["vec_id"], "cell": np.argmax(m @ cent.T, axis=1)})

    cells = emb.select("vec_id", "embedding").mapInPandas(route, "vec_id long, cell int")
    corpus_cells = emb.join(cells, "vec_id")

    def route_queries(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cent = bc.value
        for b in batches:
            if b.empty:
                continue
            m = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            top = np.argsort(-(m @ cent.T), axis=1)[:, :3]
            yield pd.DataFrame({"query_id": np.repeat(b["vec_id"].to_numpy(), 3),
                                "cell": top.ravel().astype(np.int32)})

    probes = (emb.select("vec_id", "embedding")
              .where(F.col("vec_id") % QUERY_MOD == 0)
              .mapInPandas(route_queries, "query_id long, cell int"))
    q_vecs = emb.select(F.col("vec_id").alias("query_id"),
                        F.col("embedding").alias("q_emb")).where(F.col("query_id") % QUERY_MOD == 0)
    cand = (probes.join(corpus_cells, "cell")
            .where(F.col("vec_id") != F.col("query_id"))
            .join(F.broadcast(q_vecs), "query_id"))
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos_sim(qs: pd.Series, cs: pd.Series) -> pd.Series:
        q = np.stack(qs.to_numpy()).astype(np.float64)
        c = np.stack(cs.to_numpy()).astype(np.float64)
        num = (q * c).sum(axis=1)
        den = np.linalg.norm(q, axis=1) * np.linalg.norm(c, axis=1)
        return pd.Series(num / den)

    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (cand.select("query_id", F.col("vec_id").alias("neighbor_id"),
                        F.round(cos_sim("q_emb", "embedding"), 6).alias("sim"))
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= TOPK)
            .orderBy("query_id", "rank"))


a = [tuple(r) for r in old_probe_rows(spark, sf).collect()]
b = [tuple(r) for r in _ivf_probe_rows(spark, sf).collect()]
assert a == b, (len(a), len(b), a[:3], b[:3])
print(f"EQUIV OK ({len(a)} probe rows)", flush=True)

results = {"old": [], "new": []}
for rep in range(4):
    for label, impl in (("old", old_probe_rows), ("new", _ivf_probe_rows)):
        gc.collect(); spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        impl(spark, sf).toPandas()
        results[label].append(round(time.perf_counter() - t0, 3))
print(f"old={results['old']} new={results['new']} "
      f"old_min={min(results['old'])} new_min={min(results['new'])}")
