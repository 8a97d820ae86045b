"""Differential fuzz: asof_join vs pandas.merge_asof (SURVEY.md §5.3).

pandas' merge_asof is an independent, widely-trusted as-of implementation —
a second oracle besides DuckDB. Hypothesis generates small random (key, ts)
frames; the union+window composition must agree exactly (allow_exact_matches
=True ≡ our right_ts <= left_ts semantic, direction='backward').

Kept to a handful of examples per run: each example is a full Spark job, and
the shrinker still gets deterministic replays from the shared example DB.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data__instagram_analysis_spark.operators.asof import asof_join

row = st.tuples(
    st.integers(min_value=0, max_value=3),   # key
    st.integers(min_value=0, max_value=50),  # ts
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left_rows=st.lists(row, min_size=1, max_size=20),
    right_rows=st.lists(row, min_size=1, max_size=20, unique=True),
)
def test_asof_matches_pandas_merge_asof(spark, left_rows, right_rows):
    # Right side must be unique per (key, ts) — the documented contract.
    right_dedup = {}
    for i, (k, t) in enumerate(right_rows):
        right_dedup[(k, t)] = float(i)
    right_pdf = pd.DataFrame(
        [(k, t, v) for (k, t), v in right_dedup.items()],
        columns=["k", "rt", "val"],
    )
    left_pdf = pd.DataFrame(left_rows, columns=["k", "lt"])
    left_pdf["lid"] = range(len(left_pdf))

    left = spark.createDataFrame(left_pdf.astype({"k": "int64", "lt": "int64"}))
    right = spark.createDataFrame(right_pdf.astype({"k": "int64", "rt": "int64"}))

    got = {
        r["lid"]: r["val"]
        for r in asof_join(
            left, right, key="k", left_ts="lt", right_ts="rt",
            payload=["val"], how="left",
        ).collect()
    }

    want_pdf = pd.merge_asof(
        left_pdf.sort_values(["lt", "lid"]),
        right_pdf.sort_values("rt"),
        left_on="lt",
        right_on="rt",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    )
    want = {
        int(r.lid): (None if pd.isna(r.val) else float(r.val))
        for r in want_pdf.itertuples()
    }
    assert got == want
