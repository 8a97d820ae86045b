"""Differential fuzz: dynamic-gap session_window vs a pure-Python
reference (SURVEY.md §5.3 second-oracle discipline, E111).

Spark's session_window(ts, gap_expr) merges overlapping [ts, ts+gap)
windows per key. The reference implementation below is the from-first-
principles definition: sort by ts, break a session whenever an event
starts strictly after the running max end of everything before it (Spark
merges on touch: an event at exactly prev_end extends the session —
verified against the falsifying example [(0,0,10),(0,10,10)] which Spark
sessionizes as ONE window [0,20)). Hypothesis
generates small random (user, ts_sec, gap_sec) frames; session starts,
sizes, and ends must agree exactly.

Kept to a handful of examples: each example is a full Spark job; the
shrinker still replays deterministically from the shared example DB.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

EPOCH = dt.datetime(2024, 1, 1)

row = st.tuples(
    st.integers(min_value=0, max_value=2),    # user
    st.integers(min_value=0, max_value=120),  # ts offset (s)
    st.sampled_from([10, 30]),                # gap (s)
)


def _reference_sessions(rows):
    """(user, ts, gap) → {(user, start_s, n_events, end_s), ...}."""
    out = set()
    by_user: dict[int, list[tuple[int, int]]] = {}
    for u, ts, gap in rows:
        by_user.setdefault(u, []).append((ts, gap))
    for u, evs in by_user.items():
        evs.sort()
        sess = None  # [start, n, max_end]
        for ts, gap in evs:
            if sess is None or ts > sess[2]:
                if sess is not None:
                    out.add((u, sess[0], sess[1], sess[2]))
                sess = [ts, 1, ts + gap]
            else:
                sess[1] += 1
                sess[2] = max(sess[2], ts + gap)
        if sess is not None:
            out.add((u, sess[0], sess[1], sess[2]))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(row, min_size=1, max_size=25, unique_by=lambda r: (r[0], r[1])))
def test_dynamic_gap_sessions_match_reference(spark, rows):
    df = spark.createDataFrame(
        [
            (u, EPOCH + dt.timedelta(seconds=ts), f"{gap} seconds")
            for u, ts, gap in rows
        ],
        "user int, ts timestamp, gap string",
    )
    got = {
        (
            r["user"],
            int((r["start"] - EPOCH).total_seconds()),
            r["n"],
            int((r["end"] - EPOCH).total_seconds()),
        )
        for r in (
            df.groupBy("user", F.session_window("ts", F.col("gap")).alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                "user",
                F.col("w.start").alias("start"),
                F.col("w.end").alias("end"),
                "n",
            )
            .collect()
        )
    }
    assert got == _reference_sessions(rows)
