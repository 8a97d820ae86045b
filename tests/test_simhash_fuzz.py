"""Differential fuzz for the SimHash banded-LSH pipeline (operators/dedup.py).

The registered queries hash-check simhash values and pairs against DuckDB
oracles at fixture scale; this test checks the structural CLAIM behind the
scale path on random corpora the fixture can't produce: the 4×15 banded
equi-join is PIGEONHOLE-EXACT for Hamming ≤ 3 — it returns exactly the
pairs a brute-force 60-bit Hamming scan finds, never more (band collisions
above the threshold are filtered) and never less (a pair within Hamming ≤ 3
cannot differ in all 4 bands).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data__instagram_analysis_spark.operators.dedup import (
    simhash,
    simhash_neardup_pairs,
)

_WORDS = ["join", "scan", "merge", "hash", "row", "batch", "sort", "key"]

doc = st.lists(
    st.sampled_from(_WORDS), min_size=3, max_size=10
).map(" ".join)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(doc, min_size=2, max_size=12))
def test_banded_pairs_equal_bruteforce_hamming(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sh = simhash(df, spark)
    sigs = {r["doc_id"]: int(r["simhash"]) for r in sh.collect()}

    got = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_neardup_pairs(sh, max_hamming=3).collect()
    }

    expected = set()
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin(sigs[a] ^ sigs[b]).count("1") <= 3:
                expected.add((a, b))
    assert got == expected, (got, expected, sigs)
