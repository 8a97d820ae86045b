"""Differential checks for the data-selection ops (E225/E230): an
independent pure-python reimplementation over the same fixture must agree
with the Spark plan — catching errors the DuckDB oracle could share with
the query (same-SQL-shape blind spots)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pandas as pd

from big_data__instagram_analysis_spark.registry import get_specs


def _docs(sf_dir) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def test_dsir_matches_python_brute_force(spark, sf_dir):
    from big_data__instagram_analysis_spark.queries.llm_text import (
        DSIR_BUCKETS,
        DSIR_TARGET_SRC,
    )

    docs = _docs(sf_dir)

    def bucket(g: str) -> int:
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % DSIR_BUCKETS

    tgt: Counter = Counter()
    raw: Counter = Counter()
    doc_feats: dict[int, list[int]] = {}
    for _, r in docs.iterrows():
        toks = [t for t in r.text.split(" ") if t]
        bs = [bucket(f"{a} {b}") for a, b in zip(toks, toks[1:])]
        (tgt if r.source == DSIR_TARGET_SRC else raw).update(bs)
        if r.source != DSIR_TARGET_SRC:
            doc_feats[r.doc_id] = bs
    ct = sum(tgt.values()) + DSIR_BUCKETS
    dt = sum(raw.values()) + DSIR_BUCKETS
    scores = {}
    for did, bs in doc_feats.items():
        if not bs:
            continue
        s = sum(
            math.log(tgt[b] + 1.0)
            - math.log(ct)
            - math.log(raw[b] + 1.0)
            + math.log(dt)
            for b in bs
        )
        scores[did] = (len(bs), round(s, 4))
    want = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))[:50]

    got = (
        get_specs()["dsir_importance_topdocs"].fn(spark, str(sf_dir)).toPandas()
    )
    assert len(got) == 50
    assert list(got.doc_id) == [d for d, _ in want]
    for row, (_, (nf, sc)) in zip(got.itertuples(), want):
        assert row.n_feats == nf
        assert abs(row.dsir_logweight - sc) < 5e-4, (row, sc)


def test_curation_funnel_matches_python_brute_force(spark, sf_dir):
    docs = _docs(sf_dir)
    counts = [0] * 5
    tokens = [0] * 5
    for text in docs.text:
        toks = [t for t in text.split(" ") if t]
        n, nd = len(toks), len(set(toks))
        modal = max(Counter(toks).values()) if toks else 0
        flags = [
            True,
            n >= 20,
            20 <= n <= 80,
            20 <= n <= 80 and nd * 20 >= n * 9,
            20 <= n <= 80 and nd * 20 >= n * 9 and modal * 8 <= n,
        ]
        for i, f in enumerate(flags):
            if f:
                counts[i] += 1
                tokens[i] += n
    got = get_specs()["curation_funnel"].fn(spark, str(sf_dir)).toPandas()
    assert list(got.n_docs) == counts
    assert list(got.n_tokens) == tokens
    # the funnel must actually funnel: every stage strictly drops someone
    assert all(a > b for a, b in zip(counts, counts[1:]))
