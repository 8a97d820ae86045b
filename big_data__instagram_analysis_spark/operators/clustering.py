"""Lloyd's k-means as pure DataFrame algebra (deterministic, no MLlib).

E8's IVF tier uses pyspark.ml's KMeans; this module is the from-scratch
loop, kept because the ITERATION SHAPE is the teachable scale pattern
(same family as operators/graph.py's CC and PageRank):

  assign   — one Arrow mapInPandas pass over the vectors with the k-row
             centroid matrix in a task broadcast: numpy computes all k
             squared distances and the argmin per batch. No shuffle of
             vectors. (Rounds 1-3 used a broadcast crossJoin with a
             zip_with/aggregate HOF distance — HOFs are interpreted, not
             codegen, and the k× row expansion measured ~1.3 s/iteration
             at sf0.1 vs ~0.2 s for the Arrow pass; same lesson as
             PERF.md §5's embedding_cosine_neardup.)
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

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_lloyd(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 3,
) -> tuple[DataFrame, list[float], Callable[[], None]]:
    """Run ``iterations`` Lloyd rounds; return (assignments, inertia, release).

    Assignments: (id, cluster_id, sq_dist). Inertia is recorded AFTER each
    assignment step (sum of squared distances to the current centroids) —
    Lloyd guarantees the sequence is non-increasing.

    RELEASE CONTRACT: the returned frame's plan references the final
    round's cached assignment and centroid broadcast, which this function
    intentionally leaves alive (eviction would re-run the Arrow scoring
    pass). The caller owns them: call ``release()`` once done with the
    returned frame's actions, or every invocation on a long-running
    driver accumulates one cached DataFrame + one live broadcast — the
    same leak class the loop body destroys for superseded rounds.
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
    prev_bc = None
    prev_assigned = None
    for _ in range(iterations):
        cmat = np.array([cen for _, cen in centroids], dtype=np.float64)
        bc = spark.sparkContext.broadcast(cmat)

        # Default-arg binding pins THIS round's broadcast: the returned
        # frame's lazy plan would otherwise see the loop variable's final
        # value through the closure.
        def assign_batches(
            batches: Iterator[pd.DataFrame], _bc=bc
        ) -> Iterator[pd.DataFrame]:
            cen = _bc.value
            for b in batches:
                if b.empty:
                    continue
                m = np.stack(b["vec"].to_numpy()).astype(np.float64)
                d2 = ((m[:, None, :] - cen[None, :, :]) ** 2).sum(axis=2)
                # np.argmin returns the FIRST minimum → lowest cluster id,
                # matching the previous min_by(cid, struct(d, cid)) tiebreak.
                cid = np.argmin(d2, axis=1)
                yield pd.DataFrame(
                    {
                        "vid": b["vid"],
                        "vec": b["vec"],
                        "cluster_id": cid.astype(np.int32),
                        "sq_dist": d2[np.arange(len(m)), cid],
                    }
                )

        # Persist: the assign pass feeds THREE actions (inertia collect,
        # the means aggregation, and — on the last round — whatever the
        # caller does with the returned frame). Without the cache each
        # action re-runs the Arrow scoring pass from the parquet scan.
        assigned = v.mapInPandas(
            assign_batches,
            "vid long, vec array<double>, cluster_id int, sq_dist double",
        ).persist()
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
        # Superseded round's broadcast + cache are dead once this round's
        # two actions finished; on a long-running driver leaving them
        # around is an executor/driver memory leak. The LAST round's stay
        # alive — the returned frame's plan references them (cache
        # eviction would re-run assign_batches, which reads the broadcast).
        if prev_bc is not None:
            prev_bc.destroy()
        if prev_assigned is not None:
            prev_assigned.unpersist()
        prev_bc, prev_assigned = bc, assigned

    final_bc, final_assigned = prev_bc, prev_assigned

    def release() -> None:
        final_assigned.unpersist()
        final_bc.destroy()

    return assigned.select("vid", "cluster_id", "sq_dist"), inertia, release
