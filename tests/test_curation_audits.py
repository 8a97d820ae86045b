"""Differential brute-force tests for the curation-layer audits:
source_quality_percentile_cut (E238) against a python per-source P50
recomputation, and epoch_shuffle_independence (E239) against a python
md5-shard chi-square recount (exact integers on both sides)."""

from __future__ import annotations

import hashlib

from big_data__instagram_analysis_spark.queries.llm_text import (
    EPOCH_SHARDS,
    epoch_shuffle_independence,
    source_quality_percentile_cut,
)


def test_percentile_cut_matches_python(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source", "text")
        .collect()
    )
    per_src: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        toks = [t for t in r["text"].split(" ") if t != ""]
        if not toks:
            continue
        div_ppm = len(set(toks)) * 1_000_000 // len(toks)
        per_src.setdefault(r["source"], []).append((div_ppm, r["doc_id"]))
    expected = {}
    for src, docs in per_src.items():
        docs.sort()
        n = len(docs)
        kept = [
            d
            for rn, d in enumerate(docs, start=1)
            if (1_000_000 if n == 1 else (rn - 1) * 1_000_000 // (n - 1)) >= 500_000
        ]
        expected[src] = (
            n,
            len(kept),
            min(v for v, _ in kept),
            max(v for v, _ in docs),
        )
    got = {
        r["source"]: (r["n_docs"], r["n_kept"], r["cut_div_ppm"], r["max_div_ppm"])
        for r in source_quality_percentile_cut(spark, sf_dir).collect()
    }
    assert got == expected and len(got) > 0
    # the P50 contract: keeps the better half (rank-exact, never more than
    # ceil(n/2)+ties, never less than 1) of EVERY source
    for src, (n, k, cut, mx) in got.items():
        assert 1 <= k <= n and cut <= mx, src


def test_epoch_shuffle_chi2_matches_python(spark, sf_dir):
    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    ]

    def shard(doc_id: int, e: int) -> int:
        h = hashlib.md5(f"{doc_id}:{e}".encode()).hexdigest()[:8]
        return int(h, 16) % EPOCH_SHARDS

    cells: dict[tuple[int, int], int] = {}
    for d in doc_ids:
        key = (shard(d, 1), shard(d, 2))
        cells[key] = cells.get(key, 0) + 1
    n = len(doc_ids)
    ncells = EPOCH_SHARDS * EPOCH_SHARDS
    chi2_num = sum((ncells * c - n) ** 2 for c in cells.values())
    chi2_num += (ncells - len(cells)) * n * n
    row = epoch_shuffle_independence(spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    assert (
        r["n_docs"],
        r["n_cells"],
        r["occupied_cells"],
        r["min_occupied_cell"],
        r["max_cell"],
        r["chi2_num"],
    ) == (
        n,
        ncells,
        len(cells),
        min(cells.values()),
        max(cells.values()),
        chi2_num,
    )
    # independence sanity: chi2 = chi2_num / (ncells * n) should be near
    # the 255 expectation for an independent re-key, far below the
    # n*(ncells-1)-ish blowup a perfectly-correlated assignment produces
    chi2 = chi2_num / (ncells * n)
    assert chi2 < 3 * (ncells - 1), "re-keyed epochs must decorrelate"
    # and the two epochs must actually move documents
    moved = sum(1 for d in doc_ids if shard(d, 1) != shard(d, 2))
    assert moved > n // 2
