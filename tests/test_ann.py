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
