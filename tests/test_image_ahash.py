"""image_ahash_neardup (E241) differential: python recomputes every aHash
bit from the synthetic pixel formula, runs the FULL pair scan (no banding),
and compares the deterministic top-100 — which simultaneously proves the
4-band pigeonhole candidate generation is complete at radius HAMMING_T."""

from __future__ import annotations

import numpy as np

from big_data__instagram_analysis_spark.queries.llm_multimodal import (
    HAMMING_T,
    image_ahash_neardup,
)


def _brute_bands(vec_id: int) -> list[int]:
    idx = np.arange(32 * 32, dtype=np.int64)
    a = ((vec_id * 31 + idx * 7) % 256).astype(np.int64).reshape(32, 32)
    bs = a.reshape(8, 4, 8, 4).sum(axis=(1, 3)).reshape(-1)
    total = int(a.sum())
    bits = (64 * bs > total).astype(np.int64)
    return [int(sum(int(bits[16 * j + t]) << t for t in range(16))) for j in range(4)]


def test_ahash_neardup_matches_full_pair_scan(spark, sf_dir):
    ids = sorted(
        r["vec_id"]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id")
        .collect()
    )
    bands = {v: _brute_bands(v) for v in ids}
    pairs = []
    for i, va in enumerate(ids):
        ba = bands[va]
        for vb in ids[i + 1 :]:
            bb = bands[vb]
            h = sum(bin(x ^ y).count("1") for x, y in zip(ba, bb))
            if h <= HAMMING_T:
                pairs.append((h, va, vb))
    pairs.sort()
    expected = [(a, b, h) for h, a, b in pairs[:100]]
    got = [
        (r["vec_a"], r["vec_b"], r["hamming"])
        for r in image_ahash_neardup(spark, sf_dir).collect()
    ]
    assert len(expected) > 0, "fixture must contain near-dup images"
    assert got == expected
    # phase structure sanity: vec ids 256 apart render IDENTICAL images,
    # so at least one hamming-0 pair must exist whenever ids span a phase
    if len(ids) > 256:
        assert expected[0][2] == 0


def _brute_audio_bands(vec_id: int) -> list[int]:
    idx = np.arange(256, dtype=np.int64)
    s = (vec_id * 7 + idx * 13) % 61 - 30
    e = np.abs(s).reshape(32, 8).sum(axis=1)
    bits = (e[1:] > e[:-1]).astype(np.int64)
    out = []
    for j in range(4):
        seg = bits[8 * j : 8 * j + (7 if j == 3 else 8)]
        out.append(int(sum(int(v) << t for t, v in enumerate(seg))))
    return out


def test_audio_fingerprint_matches_full_pair_scan(spark, sf_dir):
    """E242 differential: python recomputes the energy-delta fingerprint
    and the full pair scan — proving the 4-band candidate generation is
    complete at radius AUDIO_HAMMING_T."""
    from big_data__instagram_analysis_spark.queries.llm_multimodal import (
        AUDIO_HAMMING_T,
        audio_fingerprint_neardup,
    )

    ids = sorted(
        r["vec_id"]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id")
        .collect()
    )
    bands = {v: _brute_audio_bands(v) for v in ids}
    pairs = []
    for i, va in enumerate(ids):
        ba = bands[va]
        for vb in ids[i + 1 :]:
            h = sum(bin(x ^ y).count("1") for x, y in zip(ba, bands[vb]))
            if h <= AUDIO_HAMMING_T:
                pairs.append((h, va, vb))
    pairs.sort()
    expected = [(a, b, h) for h, a, b in pairs[:100]]
    got = [
        (r["vec_a"], r["vec_b"], r["hamming"])
        for r in audio_fingerprint_neardup(spark, sf_dir).collect()
    ]
    assert len(expected) > 0, "fixture must contain near-dup waveforms"
    assert got == expected
    # phase structure: ids 61 apart render identical PCM → hamming-0 pairs
    assert expected[0][2] == 0
