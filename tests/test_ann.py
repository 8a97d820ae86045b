"""Recall property checks for the approximate ANN paths (SURVEY.md §5.3.3).

The LSH and IVF queries are rows-only in the driver (hash family / centroid
state isn't portable SQL), so their quality gate lives here: recall against
the exact brute-force baseline on the same fixture.
"""

from __future__ import annotations

from big_data__instagram_analysis_spark.queries.llm_similarity import (
    _lsh_candidate_pairs as _lsh_pairs_helper,
)
from big_data__instagram_analysis_spark.registry import get_specs


def _exact_topk(spark, sf_dir):
    spec = get_specs()["ann_topk_queries"]
    out = {}
    for r in spec.fn(spark, sf_dir).collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ivf_recall(spark, sf_dir):
    """IVF with nprobe=2/8 cells must recover ≥60% of exact top-5 overall."""
    exact = _exact_topk(spark, sf_dir)
    got = {}
    from big_data__instagram_analysis_spark.queries.llm_similarity import (
        _ivf_probe_rows,
    )

    for r in _ivf_probe_rows(spark, sf_dir).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(exact[q] & got.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.6, f"IVF recall {hits}/{total}"


def test_lsh_finds_top_pairs(spark, sf_dir):
    """LSH candidate pairs must include most of the global exact top pairs.

    Uses the exact all-pairs top-10 (embed_knn_allpairs) as ground truth and
    requires ≥80% of those pairs to surface in the LSH join output.
    """
    exact_pairs = {
        (r["vec_a"], r["vec_b"])
        for r in get_specs()["embed_knn_allpairs"].fn(spark, sf_dir).collect()
    }
    lsh_pairs = {
        (r["vec_a"], r["vec_b"])
        for r in _lsh_pairs_helper(spark, sf_dir).collect()
    }
    hit = len(exact_pairs & lsh_pairs)
    assert hit / len(exact_pairs) >= 0.8, f"LSH recall {hit}/{len(exact_pairs)}"


def test_ivf_training_collect_is_bounded(spark, sf_dir):
    """The IVF centroid-training collect must be O(IVF_TRAIN_N x dims), not
    O(corpus) — the round-3 VERDICT flagged a full-table toPandas() here.

    Two guarantees pinned: (a) the sample plans as TakeOrderedAndProject
    (per-task local top-N + N-row driver merge — no global sort shuffle, no
    full scan collect), (b) even on a corpus inflated well past IVF_TRAIN_N
    the materialized sample stays capped at IVF_TRAIN_N rows."""
    from big_data__instagram_analysis_spark.io import load
    from big_data__instagram_analysis_spark.queries.llm_similarity import (
        IVF_NCELLS,
        IVF_TRAIN_N,
        _ivf_train_centroids,
        _ivf_training_sample,
    )

    emb = load(spark, sf_dir, "embeddings")
    samp = _ivf_training_sample(emb)
    plan = samp._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan

    # Inflate the corpus 40x (unique ids) so it dwarfs IVF_TRAIN_N; the
    # sample must still cap at IVF_TRAIN_N and training must still work.
    from pyspark.sql import functions as F

    n = emb.count()
    big = emb.crossJoin(spark.range(40).select(F.col("id").alias("rep"))).select(
        (F.col("vec_id") + F.col("rep") * F.lit(n * 2)).alias("vec_id"),
        "embedding",
    )
    assert big.count() == 40 * n
    assert _ivf_training_sample(big).count() == IVF_TRAIN_N
    cents = _ivf_train_centroids(big)
    assert cents.shape[0] == IVF_NCELLS


def test_lsh_bucket_groups_are_bounded(spark, sf_dir):
    """No LSH pair-scoring group may exceed the occupancy cap — the
    round-4 VERDICT flagged an unbounded per-(band,bucket) pandas group
    (one-task skew + executor OOM on a near-isotropic corpus where a 0.25
    bucket holds ~half the vectors).

    Pins, on a 40x-inflated corpus (so raw occupancy dwarfs the cap):
    (a) every (band, bucket, bi, bj) scoring group stays ≤ 2 blocks of
        hash-concentrated size — bounded by 2·(B + 6√B) rows however big
        the bucket (xxhash64 is deterministic, so this is exact, not
        flaky);
    (b) blocking loses no pairs: on the real corpus the blocked scorer's
        output equals the quadratic per-bucket reference computed in
        numpy (every same-bucket pair meets in exactly one block pair).
    """
    import numpy as np
    from pyspark.sql import functions as F

    from big_data__instagram_analysis_spark.io import load
    from big_data__instagram_analysis_spark.queries.llm_similarity import (
        LSH_MAX_BUCKET_ROWS,
        _lsh_blocked,
        _lsh_candidate_pairs,
    )
    from big_data__instagram_analysis_spark.queries import llm_similarity as mod

    emb = load(spark, sf_dir, "embeddings")
    n = emb.count()
    big = emb.crossJoin(spark.range(40).select(F.col("id").alias("rep"))).select(
        (F.col("vec_id") + F.col("rep") * F.lit(n * 2)).alias("vec_id"),
        "embedding",
    )

    rng = np.random.default_rng(42)
    proj = rng.normal(size=(mod.LSH_TABLES, 64))
    proj = proj / np.linalg.norm(proj, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast(proj)

    import pandas as pd
    from typing import Iterator

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pr = bc.value
        for b in batches:
            if b.empty:
                continue
            m = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            h = np.floor((m @ pr.T) / mod.LSH_BUCKET_LEN).astype(np.int64)
            k = len(b)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(b["vec_id"].to_numpy(), mod.LSH_TABLES),
                    "band": np.tile(np.arange(mod.LSH_TABLES, dtype=np.int32), k),
                    "bucket": h.ravel(),
                    "embedding": np.repeat(b["embedding"].to_numpy(), mod.LSH_TABLES),
                }
            )

    buckets = big.select("vec_id", "embedding").mapInPandas(
        bucketize, "vec_id long, band int, bucket long, embedding array<float>"
    )
    raw_max = (
        buckets.groupBy("band", "bucket").count().agg(F.max("count")).collect()[0][0]
    )
    assert raw_max > 4 * LSH_MAX_BUCKET_ROWS, (
        f"fixture no longer stresses the cap (max occupancy {raw_max})"
    )
    group_max = (
        _lsh_blocked(buckets)
        .groupBy("band", "bucket", "bi", "bj")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    bound = 2 * (LSH_MAX_BUCKET_ROWS + 6 * int(LSH_MAX_BUCKET_ROWS**0.5))
    assert group_max <= bound, f"scoring group of {group_max} rows > {bound}"

    # (b) parity with the unblocked quadratic reference on the real corpus.
    pairs = {
        (r["vec_a"], r["vec_b"], r["cos_sim"])
        for r in _lsh_candidate_pairs(spark, sf_dir).collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.stack([np.array(r["embedding"], dtype=np.float64) for r in rows])
    mu = m / np.linalg.norm(m, axis=1, keepdims=True)
    h = np.floor((mu @ proj.T) / mod.LSH_BUCKET_LEN).astype(np.int64)
    want = set()
    for band in range(mod.LSH_TABLES):
        for bucket in np.unique(h[:, band]):
            idx = np.where(h[:, band] == bucket)[0]
            if len(idx) < 2:
                continue
            sim = mu[idx] @ mu[idx].T
            ia, ib = np.where(np.triu(sim >= mod.LSH_COS_CUT, k=1))
            for x, y in zip(idx[ia], idx[ib]):
                a, b = (ids[x], ids[y]) if ids[x] < ids[y] else (ids[y], ids[x])
                want.add((a, b, round(float(mu[x] @ mu[y]), 6)))
    assert pairs == want


def test_semdedup_assignment_is_total_and_codebook_bounded(spark, sf_dir):
    """E224 invariants: (a) the codebook selection plans as
    TakeOrderedAndProject (k-row driver merge, no full-table collect),
    (b) the two-phase margin assignment assigns EVERY vector exactly once
    (the margin argument — no vector lost to candidate pruning, no vector
    double-assigned after the exact-argmax row_number)."""
    from pyspark.sql import functions as F

    from big_data__instagram_analysis_spark.io import load
    from big_data__instagram_analysis_spark.queries.llm_similarity import (
        SEMDEDUP_K,
    )

    emb = load(spark, sf_dir, "embeddings")
    sel = (
        emb.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(SEMDEDUP_K)
    )
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan

    from big_data__instagram_analysis_spark.registry import get_specs

    out = get_specs()["semantic_dedup_clusters"].fn(spark, str(sf_dir)).toPandas()
    assert len(out) == SEMDEDUP_K
    assert out["n_members"].sum() == emb.count()
    # removed ⊆ members, pairs ≥ removed (each removed id has ≥1 pair)
    assert (out["n_removed"] <= out["n_members"]).all()
    assert (out["n_dup_pairs"] >= out["n_removed"]).all()


def test_matryoshka_audit_invariants(spark, sf_dir):
    """E232: agreement is monotone in rank (top1-agree ⊆ in-top5) and in
    dimension (more prefix dims can only track the full ranking better
    on the fixture), and counts are bounded by the query count."""
    from big_data__instagram_analysis_spark.registry import get_specs

    out = (
        get_specs()["matryoshka_truncation_audit"]
        .fn(spark, str(sf_dir))
        .toPandas()
        .set_index("dim")
    )
    for d in (16, 32):
        r = out.loc[d]
        assert 0 <= r["n_top1_agree"] <= r["n_top1_in_full_top5"] <= r["n_queries"]
    assert out.loc[32, "n_top1_agree"] >= out.loc[16, "n_top1_agree"]


def test_embedding_decontamination_matches_numpy_brute(spark, sf_dir):
    """E248 differential: the flagged set, per-candidate argmax anchor and
    rounded max-sim must equal a numpy brute-force recomputation (beyond
    the oracle: an independent engine-free ground truth)."""
    import numpy as np

    from big_data__instagram_analysis_spark.io import load
    from big_data__instagram_analysis_spark.queries.llm_similarity import (
        DECON_ANCHOR_MAX_ID,
        DECON_TAU,
    )
    from big_data__instagram_analysis_spark.registry import get_specs

    out = get_specs()["embedding_decontamination"].fn(spark, str(sf_dir)).toPandas()
    assert len(out) > 0  # anti-vacuousness: tau measured in-distribution

    pdf = load(spark, str(sf_dir), "embeddings").toPandas()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ids = pdf["vec_id"].to_numpy()
    is_anchor = ids < DECON_ANCHOR_MAX_ID
    a_ids, c_ids = ids[is_anchor], ids[~is_anchor]
    sims = mat[~is_anchor] @ mat[is_anchor].T
    expect = {}
    for ci in range(len(c_ids)):
        r = np.round(sims[ci], 6)
        best = r.max()
        if best >= DECON_TAU:
            # tiebreak: max sim, then min anchor_id — the declared order
            anchor = a_ids[np.nonzero(r == best)[0]].min()
            expect[int(c_ids[ci])] = (int(anchor), float(best))
    got = {
        int(r.cand_id): (int(r.anchor_id), float(r.max_sim))
        for r in out.itertuples()
    }
    assert got == expect
