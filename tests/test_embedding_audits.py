"""Differential brute-force tests for the embedding-training audits:
hard_negative_mining (E236) against a straight numpy pair scan, and
sq8_quantization_audit (E237) against a per-element python reimplementation
(exact integer comparison — the emit is fixed-point by construction)."""

from __future__ import annotations

import math

import numpy as np

from big_data__instagram_analysis_spark.queries.llm_similarity import (
    QUERY_MOD,
    hard_negative_mining,
    sq8_quantization_audit,
)


def _load_np(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    labels = np.array([r["label"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, labels, mat


def test_hard_negatives_match_numpy_pair_scan(spark, sf_dir):
    ids, labels, mat = _load_np(spark, sf_dir)
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = normed @ normed.T
    got = {
        r["query_id"]: r.asDict() for r in hard_negative_mining(spark, sf_dir).collect()
    }
    anchors = [i for i in range(len(ids)) if ids[i] % QUERY_MOD == 0]
    assert len(got) == len(anchors) > 0
    for qi in anchors:
        row = got[ids[qi]]
        assert row["label"] == labels[qi]
        for cls, want_same in (("pos", True), ("neg", False)):
            cand = [
                j
                for j in range(len(ids))
                if j != qi and (labels[j] == labels[qi]) == want_same
            ]
            assert cand, "fixture must have both classes per anchor"
            # mirror the operator's (round(sim,6) DESC, cand_id ASC) rank
            best = min(cand, key=lambda j: (-round(sims[qi, j], 6), ids[j]))
            assert row[f"{cls}_id"] == ids[best], (ids[qi], cls)
            assert math.isclose(row[f"{cls}_sim"], round(sims[qi, best], 6), abs_tol=2e-6)
        assert math.isclose(
            row["margin"], row["pos_sim"] - row["neg_sim"], abs_tol=1e-12
        )
        # hardest positive is still same-label nearest: margin can be any
        # sign on a near-isotropic corpus, but both sims must be <= the
        # global max similarity for the anchor
        m = max(round(sims[qi, j], 6) for j in range(len(ids)) if j != qi)
        assert row["pos_sim"] <= m + 1e-9 and row["neg_sim"] <= m + 1e-9


def test_sq8_audit_matches_python_exactly(spark, sf_dir):
    ids, labels, mat = _load_np(spark, sf_dir)
    got = {
        r["vec_id"]: r.asDict()
        for r in sq8_quantization_audit(spark, sf_dir).collect()
    }
    assert len(got) == len(ids) > 0
    for i in range(len(ids)):
        e = mat[i]
        mn, mx = float(e.min()), float(e.max())
        if mx == mn:
            q = [0] * len(e)
        else:
            q = [int(math.floor((x - mn) * 255.0 / (mx - mn) + 0.5)) for x in e]
        err = 0
        for x, qi in zip(e, q):
            r = x - (mn + qi * (mx - mn) / 255.0)
            err += int(math.floor(r * r * 1e12 + 0.5))
        row = got[ids[i]]
        assert row["q_checksum"] == sum(v * (j + 1) for j, v in enumerate(q))
        assert row["n_sat"] == sum(1 for v in q if v in (0, 255))
        assert row["err_q12"] == err
        assert row["mn"] == mn and row["mx"] == mx
        assert all(0 <= v <= 255 for v in q)


def test_sq8_plan_is_scan_shaped(spark, sf_dir):
    from big_data__instagram_analysis_spark.registry import get_specs

    df = get_specs()["sq8_quantization_audit"].fn(spark, sf_dir)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    ).lower()
    assert "generate" not in plan, "quantization must not explode elements"
    assert "hashpartitioning" not in plan, "no shuffle besides the final sort"
    assert "batchevalpython" not in plan and "arroweval" not in plan, "no UDFs"


def test_kcenter_coreset_matches_python_greedy(spark, sf_dir):
    """E246 differential: python runs the exact greedy farthest-point
    traversal (rounded-distance ordering, vec_id tiebreak — the operator's
    determinism contract) and compares the full selection sequence, then
    checks the covering-radius certificate (non-increasing radii; every
    corpus point within the last pick's radius of the coreset)."""
    from big_data__instagram_analysis_spark.queries.llm_similarity import (
        KCENTER_K,
        kcenter_coreset_select,
    )

    ids, _labels, mat = _load_np(spark, sf_dir)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    seed = 0  # min vec_id after sort
    md = ((mat - mat[seed]) ** 2).sum(axis=1)
    picks = [(0, int(ids[seed]), 0.0)]
    chosen = {seed}
    for r in range(1, KCENTER_K):
        best = min(
            (i for i in range(len(ids)) if i not in chosen),
            key=lambda i: (-round(md[i], 6), ids[i]),
        )
        picks.append((r, int(ids[best]), float(round(md[best], 6))))
        chosen.add(best)
        md = np.minimum(md, ((mat - mat[best]) ** 2).sum(axis=1))
    got = [
        (r["rank"], r["vec_id"], r["dist_q6"])
        for r in kcenter_coreset_select(spark, sf_dir).collect()
    ]
    assert got == picks
    # quality certificate: radii non-increasing, and the final running
    # min-distance (over ALL points) is bounded by the last pick's radius
    radii = [d for _, _, d in picks[1:]]
    assert all(a >= b - 1e-9 for a, b in zip(radii, radii[1:]))
    assert md.max() <= radii[-1] + 1e-6
