"""Lloyd's k-means as pure DataFrame algebra (deterministic, no MLlib).

E8's IVF tier uses pyspark.ml's KMeans; this module is the from-scratch
loop, kept because the ITERATION SHAPE is the teachable scale pattern
(same family as operators/graph.py's CC and PageRank):

  assign   — fact side (vectors) joins a k-row centroid table: always a
             broadcast join; distance is a zip_with/aggregate HOF inside
             codegen, argmin via min_by. One pass, no shuffle of vectors.
  update   — per-cluster dimension-wise mean via posexplode + (cid, pos)
             aggregation: one shuffle of k×dims cells, never vectors.
  centroid table stays k×dims — collected to the driver each round (tiny
             by construction) and re-broadcast, which also truncates plan
             lineage the way localCheckpoint does for CC.

Determinism: init = the k vectors with the smallest ids (not RNG), and
the argmin tie-breaks on cluster id — so runs are reproducible and the
inertia sequence is a testable monotone invariant (Lloyd's guarantee).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kmeans_lloyd(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 3,
) -> tuple[DataFrame, list[float]]:
    """Run ``iterations`` Lloyd rounds; return (assignments, inertia history).

    Assignments: (id, cluster_id, sq_dist). Inertia is recorded AFTER each
    assignment step (sum of squared distances to the current centroids) —
    Lloyd guarantees the sequence is non-increasing.
    """
    spark = vectors.sparkSession
    v = vectors.select(
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    )
    init = [
        [float(x) for x in r["vec"]]
        for r in v.orderBy("vid").limit(k).collect()
    ]
    centroids = [(i, init[i]) for i in range(len(init))]
    inertia: list[float] = []
    assigned = None
    for _ in range(iterations):
        cdf = spark.createDataFrame(centroids, "cid int, cen array<double>")
        assigned = (
            v.crossJoin(F.broadcast(cdf))
            .select("vid", "vec", "cid", _sq_dist(F.col("vec"), F.col("cen")).alias("d"))
            .groupBy("vid", "vec")
            .agg(
                F.expr("min_by(cid, struct(d, cid))").alias("cluster_id"),
                F.min("d").alias("sq_dist"),
            )
        )
        inertia.append(assigned.agg(F.sum("sq_dist")).collect()[0][0])
        means = (
            assigned.select("cluster_id", F.posexplode("vec").alias("pos", "val"))
            .groupBy("cluster_id", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cluster_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cen")
            )
            .collect()
        )
        # Empty clusters keep their previous centroid (standard fallback).
        new_c = dict(centroids)
        for r in means:
            new_c[r["cluster_id"]] = [float(x) for x in r["cen"]]
        centroids = sorted(new_c.items())
    return assigned.select("vid", "cluster_id", "sq_dist"), inertia
