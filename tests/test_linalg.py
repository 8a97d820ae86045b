"""Differential + property tests for the linalg/sketch operators
(E250-E253): CDC chunking against a pure-python rechunker (plus the
boundary self-synchronization property CDC exists for), Count-Min against
a python dict sketch, the Gram matrix against a straight numpy matmul,
and power iteration against numpy's dominant eigenvector."""

from __future__ import annotations

import hashlib

import numpy as np

from big_data__instagram_analysis_spark.queries.linalg import (
    CMS_DEPTH,
    CMS_WIDTH,
    GRAM_DIM,
    GRAM_SCALE,
    POWER_NORM,
    countmin_sketch_estimates,
    embedding_gram_matrix,
    gram_power_iteration,
)
from big_data__instagram_analysis_spark.queries.llm_text import (
    CDC_BOUNDARY_HEX,
    CDC_W,
    cdc_duplicate_chunks,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _cdc_chunks(tokens: list[str]) -> list[list[str]]:
    """Pure-python CDC reference: cut AFTER position i (1-based) when the
    window of the last CDC_W tokens hashes into the boundary bucket."""
    chunks: list[list[str]] = [[]]
    for i in range(1, len(tokens) + 1):
        chunks[-1].append(tokens[i - 1])
        if i >= CDC_W:
            gram = " ".join(tokens[i - CDC_W : i])
            if _md5(gram)[0] in CDC_BOUNDARY_HEX:
                chunks.append([])
    return [c for c in chunks if c]


def _doc_tokens(spark, sf_dir) -> dict[int, list[str]]:
    rows = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    return {
        r["doc_id"]: [t for t in r["text"].split(" ") if t] for r in rows
    }


def test_cdc_matches_python_rechunker(spark, sf_dir):
    docs = _doc_tokens(spark, sf_dir)
    # Reference duplicate-chunk report.
    occ: dict[str, list[tuple[int, int]]] = {}
    for doc_id, toks in docs.items():
        for c in _cdc_chunks(toks):
            h = _md5(" ".join(c))
            occ.setdefault(h, []).append((doc_id, len(c)))
    dup = {
        h: v for h, v in occ.items() if len({d for d, _ in v}) >= 2
    }
    want = sorted(
        (
            (
                -len(v),
                h,
                min(n for _, n in v),
                len({d for d, _ in v}),
                min(d for d, _ in v),
            )
            for h, v in dup.items()
        ),
    )[:100]
    got = cdc_duplicate_chunks(spark, sf_dir).collect()
    assert len(got) == len(want) > 0
    for row, (neg_occ, h, n_toks, n_docs, first_doc) in zip(got, want):
        assert row["chunk_md5"] == h
        assert row["n_occurrences"] == -neg_occ
        assert row["n_chunk_tokens"] == n_toks
        assert row["n_docs"] == n_docs
        assert row["first_doc_id"] == first_doc


def test_cdc_boundaries_self_synchronize():
    """The property CDC exists for: a prefix edit leaves every chunk after
    the next anchor identical, while fixed-stride chunking shifts them all."""
    rng = np.random.RandomState(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    base = [vocab[i] for i in rng.randint(0, len(vocab), 400)]
    edited = ["INSERTED"] + base  # one-token prefix insertion
    a = ["~".join(c) for c in _cdc_chunks(base)]
    b = ["~".join(c) for c in _cdc_chunks(edited)]
    # Everything after the first post-edit anchor re-aligns EXACTLY: the
    # two chunk sequences share a common suffix covering all but the
    # chunk(s) whose boundary windows contain the inserted token.
    suffix = 0
    while suffix < min(len(a), len(b)) and a[-1 - suffix] == b[-1 - suffix]:
        suffix += 1
    assert suffix >= len(a) - 2, (suffix, len(a))
    # Fixed-stride (size 8) chunking, by contrast, loses alignment.
    fixed_a = {"~".join(base[s : s + 8]) for s in range(0, len(base), 8)}
    fixed_b = {"~".join(edited[s : s + 8]) for s in range(0, len(edited), 8)}
    assert len(fixed_a & fixed_b) < 0.5 * len(fixed_a)


def _cms_bucket(r: int, tok: str) -> int:
    return int(_md5(f"{r}:{tok}")[:8], 16) % CMS_WIDTH


def test_countmin_matches_python_sketch(spark, sf_dir):
    docs = _doc_tokens(spark, sf_dir)
    counts: dict[str, int] = {}
    grid = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    for toks in docs.values():
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
            for r in range(CMS_DEPTH):
                grid[r, _cms_bucket(r, t)] += 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = countmin_sketch_estimates(spark, sf_dir).collect()
    assert [(r["token"], r["true_n"]) for r in got] == top
    for row in got:
        est = min(
            grid[r, _cms_bucket(r, row["token"])] for r in range(CMS_DEPTH)
        )
        assert row["est_n"] == est
        # CMS one-sided error guarantee, always.
        assert row["est_n"] >= row["true_n"]
        assert row["never_undercounts"] is True
        assert row["over_ppm"] == (est - row["true_n"]) * 1_000_000 // row["true_n"]


def _quantized(spark, sf_dir) -> np.ndarray:
    mat = np.array(
        [
            r["embedding"]
            for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    return np.floor(mat * GRAM_SCALE).astype(np.int64)


def test_gram_matrix_matches_numpy(spark, sf_dir):
    q = _quantized(spark, sf_dir)
    want = q.T @ q
    rows = embedding_gram_matrix(spark, sf_dir).collect()
    assert len(rows) == GRAM_DIM * (GRAM_DIM + 1) // 2
    for r in rows:
        assert r["i"] <= r["j"]
        assert r["g"] == want[r["i"], r["j"]], (r["i"], r["j"])


def _power_orbit_python(g: np.ndarray) -> list[int]:
    """Bit-exact python replay of the integer power-iteration orbit."""
    xi = np.full(GRAM_DIM, POWER_NORM, dtype=object)
    gi = g.astype(object)
    for _ in range(8):
        y = gi @ xi
        m = max(int(abs(v)) for v in y) // POWER_NORM or 1
        xi = np.array(
            [int(v) // m if v >= 0 else -((-int(v)) // m) for v in y],
            dtype=object,
        )
    if next(v for v in xi if v != 0) < 0:
        xi = -xi
    return [int(v) for v in xi]


def test_power_iteration_orbit_and_rayleigh_on_fixture(spark, sf_dir):
    """The fixture spectrum is near-isotropic (λ1/λ2 ≈ 1.02-1.07), so 8
    rounds cannot align the DIRECTION — what the operator guarantees there
    is (a) the bit-exact deterministic orbit and (b) a Rayleigh quotient
    already ≈ 0.9·λ1 (the eigenvalue estimate converges like a
    λ-weighted mean even when the vector hasn't). Direction convergence
    is proven on a gapped corpus in the spiked test below."""
    q = _quantized(spark, sf_dir).astype(np.float64)
    g = q.T @ q
    got = gram_power_iteration(spark, sf_dir).collect()
    assert len(got) == GRAM_DIM
    x = np.array(
        [r["loading"] for r in sorted(got, key=lambda r: r["pos"])],
        dtype=np.float64,
    )
    assert np.max(np.abs(x)) <= POWER_NORM + 2  # normalization bound
    nz = x[x != 0]
    assert nz[0] > 0  # sign canonicalization
    # bit-exact orbit replay
    assert _power_orbit_python(g) == [int(v) for v in x]
    # Rayleigh certificate: the eigenvalue estimate is already near λ1.
    lam1 = np.linalg.eigvalsh(g)[-1]
    rq = (x @ g @ x) / (x @ x)
    assert rq >= 0.88 * lam1, (rq, lam1)


def test_power_iteration_direction_on_spiked_corpus(spark, tmp_path):
    """End-to-end through the registered Spark operator on a synthetic
    spiked corpus (λ1/λ2 ≈ 26): 8 integer rounds must recover the planted
    principal direction to cos > 0.999."""
    rng = np.random.RandomState(0)
    n = 400
    spike = rng.randn(GRAM_DIM)
    spike /= np.linalg.norm(spike)
    mat = 0.3 * rng.randn(n, GRAM_DIM) + np.outer(rng.randn(n) * 2.0, spike)
    mat = mat.astype(np.float32)
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [row.tolist() for row in mat],
            "label": np.zeros(n, dtype=np.int64),
        }
    )
    sf = str(tmp_path / "spiked")
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        f"{sf}/embeddings.parquet"
    )
    q = np.floor(mat.astype(np.float64) * GRAM_SCALE)
    g = q.T @ q
    evals, evecs = np.linalg.eigh(g)
    assert evals[-1] / evals[-2] > 5  # genuinely gapped
    got = gram_power_iteration(spark, sf).collect()
    x = np.array(
        [r["loading"] for r in sorted(got, key=lambda r: r["pos"])],
        dtype=np.float64,
    )
    cos = abs(x @ evecs[:, -1]) / np.linalg.norm(x)
    assert cos > 0.999, cos
    assert _power_orbit_python(g) == [int(v) for v in x]
