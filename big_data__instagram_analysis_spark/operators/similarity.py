"""Similarity search over embedding columns (SURVEY.md §2 L3, J6).

Design for 100 TB:
  - ``cosine_topk`` streams the big side (A) partition-by-partition through an
    Arrow-batched ``mapInPandas`` while the small side (B — the query set, or
    the dedup candidate set) is a task broadcast of a dense float64 matrix.
    Each task computes a numpy matmul block and keeps only a chunk-local
    top-k (plus a rounding-margin band), so the shuffle carries O(k) rows per
    task regardless of |A|. The global top-k is a TakeOrderedAndProject.
  - The exact-HOF variant (``cosine_allpairs_hof``) keeps everything in
    Catalyst expressions — bit-exact vs DuckDB's sequential list_sum, but
    the expression fold is interpreted (no codegen): use it for parity
    checks at small scale, not as the scale path.
  - The LSH scale path for all-pairs near-neighbor lives in
    ``bucketed_random_projection`` (pyspark.ml), which replaces the
    quadratic pair space with per-bucket joins.

Parity note: the final ROUND + (sim, ids) ordering happens in Spark
expressions (same HALF_UP semantics as the DuckDB oracle); the UDF emits raw
doubles and keeps every pair within ROUND_MARGIN of its chunk's k-th best so
rounding can never change which rows survive chunk pruning.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Keep chunk-local candidates within this raw-sim margin of the k-th best —
#: wide enough that 1e-6 rounding plus float noise cannot evict a global
#: top-k contender during chunk pruning.
ROUND_MARGIN = 1e-5

#: Rows per matmul slice inside the Arrow-batch loop: bounds the sims
#: matrix + mask temporaries to ~CH×|B|×9 bytes per call (≈4 MB at the
#: 2000-vector bench tier) no matter how large an Arrow batch the scan
#: delivers. Same FLOPs — this is allocation/bandwidth discipline, not an
#: algorithm change (PERF.md §56).
SIM_CHUNK = 256

#: Enforced ceiling on the driver-materialized broadcast matrix (float64
#: bytes). The brute-force operators' contract is "one side fits in executor
#: memory"; past this, use the sub-quadratic paths instead
#: (``ann_lsh_bucketed`` / ``ann_ivf_probe`` in queries/llm_similarity.py).
#: Overridable for larger driver/executor heaps. Checked after the collect
#: (no extra Spark jobs on the hot path — ``spark.driver.maxResultSize``
#: already bounds the collect itself with a clear error).
BROADCAST_MATRIX_MAX_BYTES = int(
    os.environ.get("SPARK_GRAFT_BROADCAST_MATRIX_MAX_BYTES", 2 << 30)
)


def _to_matrix(pdf: pd.DataFrame, vec_col: str) -> np.ndarray:
    return np.stack(pdf[vec_col].to_numpy()).astype(np.float64, copy=False)


def _broadcast_normalized(
    df: DataFrame, spark: SparkSession, id_col: str, vec_col: str, *, caller: str
):
    """Materialize (ids, row-normalized float64 matrix) and broadcast it.

    Enforces BROADCAST_MATRIX_MAX_BYTES — the documented "one side fits"
    memory contract — with an error that names the sub-quadratic
    alternatives, instead of letting a 100 TB misuse OOM an executor.
    """
    pdf = df.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy().astype(np.int64)
    mat = _to_matrix(pdf, vec_col)
    if mat.nbytes > BROADCAST_MATRIX_MAX_BYTES:
        raise ValueError(
            f"{caller}: broadcast side is {mat.nbytes / 2**30:.2f} GiB of "
            f"float64 ({mat.shape[0]} vectors × dim {mat.shape[1]}), above "
            f"the {BROADCAST_MATRIX_MAX_BYTES / 2**30:.2f} GiB brute-force "
            "contract. Use the sub-quadratic paths (ann_lsh_bucketed / "
            "ann_ivf_probe, queries/llm_similarity.py) or raise "
            "SPARK_GRAFT_BROADCAST_MATRIX_MAX_BYTES if your executors can "
            "hold it."
        )
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    return spark.sparkContext.broadcast((ids, normed))


def cosine_topk_allpairs(
    emb: DataFrame,
    spark: SparkSession,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """All-pairs cosine top-k (id_a < id_b), vectorized.

    B (the whole table) is broadcast as a dense matrix — valid while one side
    fits in executor memory (the query-set contract); A streams through
    mapInPandas in Arrow batches. Emits (vec_a, vec_b, sim) with sim rounded
    via Spark's ROUND so the oracle comparison shares rounding semantics.
    """
    bc = _broadcast_normalized(emb, spark, id_col, vec_col, caller="cosine_topk_allpairs")

    out_schema = "vec_a long, vec_b long, sim double"

    def chunk_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_b, nb = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            a_ids_all = pdf[id_col].to_numpy().astype(np.int64)
            a_mat_all = _to_matrix(pdf, vec_col)
            # Row-sliced matmul (round 10): an Arrow batch can be the whole
            # table at bench tier (one scan split), and a full-batch
            # |batch|×|B| sims matrix plus its boolean mask/gather
            # temporaries is tens of MB of allocation per call — measured
            # as the bench set's dominant wall-variance source (isolated
            # spikes 0.3→1.2 s; 4-10 s under the concurrent pass, where
            # the memory-bandwidth-bound mask/gather ops collide with 9
            # other jobs and the JVM's GC threads — PERF.md §56). Slicing
            # to SIM_CHUNK rows bounds temporaries to ~4 MB regardless of
            # batch size (same FLOPs, cache-resident), and chunk-local
            # top-k keeps the emitted rows O(k) per slice.
            for st in range(0, len(a_ids_all), SIM_CHUNK):
                a_ids = a_ids_all[st : st + SIM_CHUNK]
                a_mat = a_mat_all[st : st + SIM_CHUNK]
                na = a_mat / np.linalg.norm(a_mat, axis=1, keepdims=True)
                sims = na @ nb.T  # (chunk, |B|)
                mask = a_ids[:, None] < ids_b[None, :]
                flat = sims[mask]
                if flat.size == 0:
                    continue
                ai, bi = np.nonzero(mask)
                if flat.size > k:
                    kth = np.partition(flat, flat.size - k)[flat.size - k]
                    keep = flat >= kth - ROUND_MARGIN
                else:
                    keep = np.ones_like(flat, dtype=bool)
                yield pd.DataFrame(
                    {
                        "vec_a": a_ids[ai[keep]],
                        "vec_b": ids_b[bi[keep]],
                        "sim": flat[keep],
                    }
                )

    candidates = emb.select(id_col, vec_col).mapInPandas(chunk_topk, out_schema)
    return (
        candidates.select(
            "vec_a", "vec_b", F.round(F.col("sim"), round_digits).alias("sim")
        )
        .orderBy(F.desc("sim"), "vec_a", "vec_b")
        .limit(k)
    )


def cosine_topk_queries(
    corpus: DataFrame,
    queries: DataFrame,
    spark: SparkSession,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Top-k corpus neighbors per query vector (ANN brute-force baseline).

    Broadcast the query matrix; stream the corpus; per-task top-k per query;
    global rank window cuts to k. Output (query_id, neighbor_id, sim, rank).
    """
    bc = _broadcast_normalized(queries, spark, id_col, vec_col, caller="cosine_topk_queries")

    out_schema = "query_id long, neighbor_id long, sim double"

    def chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, nq = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            c_ids = pdf[id_col].to_numpy().astype(np.int64)
            c_mat = _to_matrix(pdf, vec_col)
            nc = c_mat / np.linalg.norm(c_mat, axis=1, keepdims=True)
            sims = nq @ nc.T  # (|Q|, chunk)
            mask = ids_q[:, None] != c_ids[None, :]
            out_q, out_n, out_s = [], [], []
            for qi in range(len(ids_q)):
                row = sims[qi]
                valid = np.nonzero(mask[qi])[0]
                if valid.size == 0:
                    continue
                take = valid
                if valid.size > k:
                    vals = row[valid]
                    kth = np.partition(vals, vals.size - k)[vals.size - k]
                    take = valid[vals >= kth - ROUND_MARGIN]
                out_q.append(np.full(take.size, ids_q[qi]))
                out_n.append(c_ids[take])
                out_s.append(row[take])
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_n),
                        "sim": np.concatenate(out_s),
                    }
                )

    from pyspark.sql.window import Window

    cand = corpus.select(id_col, vec_col).mapInPandas(chunk, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim_r"), F.asc("neighbor_id")
    )
    return (
        cand.select(
            "query_id",
            "neighbor_id",
            F.round(F.col("sim"), round_digits).alias("sim_r"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.col("sim_r").alias("sim"), "rank"
        )
    )


def cosine_threshold_pairs(
    emb: DataFrame,
    spark: SparkSession,
    *,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """All pairs with cosine ≥ threshold — vectorized candidates, exact emit.

    Two-phase plan so the quadratic pair space never touches interpreted
    expressions (78 s → ~2 s at 2,000 vecs measured):

      1. Candidate generation: broadcast the normalized matrix, stream the
         table through mapInPandas, numpy-matmul each chunk against it and
         keep pairs with raw sim ≥ threshold − ROUND_MARGIN. Emits only ids.
      2. Exact emit: join the (few) candidate pairs back to their vectors
         and recompute sim with the bit-exact HOF fold, filtering at the
         true rounded threshold — so the output hashes identically to the
         DuckDB oracle's sequential list_sum, while the heavy math stayed in
         numpy. The margin guarantees no true pair is lost in phase 1.
    """
    bc = _broadcast_normalized(emb, spark, id_col, vec_col, caller="cosine_threshold_pairs")
    cut = threshold - ROUND_MARGIN

    def chunk_pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_b, nb = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            a_ids = pdf[id_col].to_numpy().astype(np.int64)
            a_mat = _to_matrix(pdf, vec_col)
            na = a_mat / np.linalg.norm(a_mat, axis=1, keepdims=True)
            sims = na @ nb.T
            mask = (a_ids[:, None] < ids_b[None, :]) & (sims >= cut)
            ai, bi = np.nonzero(mask)
            if ai.size:
                yield pd.DataFrame({"vec_a": a_ids[ai], "vec_b": ids_b[bi]})

    cand = emb.select(id_col, vec_col).mapInPandas(
        chunk_pairs, "vec_a long, vec_b long"
    )

    ed = emb.select(
        F.col(id_col), F.transform(vec_col, lambda x: x.cast("double")).alias("emb")
    )

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
        )

    def _norm(a):
        return F.sqrt(
            F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
        )

    a_side = ed.select(F.col(id_col).alias("vec_a"), F.col("emb").alias("ea"))
    b_side = ed.select(F.col(id_col).alias("vec_b"), F.col("emb").alias("eb"))
    sim = _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb")))
    return (
        cand.join(a_side, "vec_a")
        .join(b_side, "vec_b")
        .select("vec_a", "vec_b", F.round(sim, round_digits).alias("sim"))
        .where(F.col("sim") >= threshold)
    )


def cosine_allpairs_hof(emb: DataFrame, *, threshold: float) -> DataFrame:
    """Catalyst-only all-pairs cosine ≥ threshold (bit-exact parity variant).

    zip_with + aggregate folds run left-to-right like DuckDB list_sum —
    bit-identical doubles — at the cost of interpreted evaluation. Quadratic:
    small candidate sets only.
    """
    ed = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
        )

    def norm(a):
        return F.sqrt(
            F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
        )

    a, b = ed.alias("a"), ed.alias("b")
    sim = dot(F.col("a.emb"), F.col("b.emb")) / (
        norm(F.col("a.emb")) * norm(F.col("b.emb"))
    )
    return (
        a.join(F.broadcast(b), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(sim, 6).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )
