"""Edge semantics of the as-of join composition (operators/asof.py).

The driver-facing asof query is oracle-checked in test_parity.py; these pin
the corner cases DuckDB's native ASOF JOIN defines but fixture data may never
exercise: NULL payloads still count as matches, equal timestamps match
(right_ts <= left_ts), and 'left' keeps unmatched rows with NULL payload.
"""

from __future__ import annotations

from big_data__instagram_analysis_spark.operators.asof import asof_join


def _dfs(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 5), (3, 7)], "k long, lt long"
    )
    right = spark.createDataFrame(
        [(1, 10, None), (1, 15, 100.0), (2, 6, 50.0)],
        "k long, rt long, val double",
    )
    return left, right


def test_null_payload_is_still_a_match(spark):
    left, right = _dfs(spark)
    out = asof_join(
        left, right, key="k", left_ts="lt", right_ts="rt", payload=["val"], how="inner"
    ).collect()
    got = {(r["k"], r["lt"]): r["val"] for r in out}
    # (1,10) matches the rt=10 NULL-payload row (equal ts counts) — must be
    # KEPT under inner with val NULL, not dropped.
    assert (1, 10) in got and got[(1, 10)] is None
    # (1,20) takes the latest right at-or-before: rt=15 → 100.0
    assert got[(1, 20)] == 100.0
    # (2,5): right rt=6 is AFTER the left ts → no match → dropped.
    # (3,7): no right rows for k=3 → dropped.
    assert set(got) == {(1, 10), (1, 20)}


def test_left_keeps_unmatched(spark):
    left, right = _dfs(spark)
    out = asof_join(
        left, right, key="k", left_ts="lt", right_ts="rt", payload=["val"], how="left"
    ).collect()
    got = {(r["k"], r["lt"]): r["val"] for r in out}
    assert set(got) == {(1, 10), (1, 20), (2, 5), (3, 7)}
    assert got[(2, 5)] is None and got[(3, 7)] is None


def test_asof_tolerance_bounds_lookback(spark):
    """A right row older than the tolerance no longer matches: payload is
    NULL for how='left', the row disappears for how='inner'."""
    from big_data__instagram_analysis_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100, "p1"), (1, 500, "p2")], "k long, t long, tag string"
    )
    right = spark.createDataFrame([(1, 90, "v")], "k long, rt long, pay string")
    out_left = asof_join(
        left, right, key="k", left_ts="t", right_ts="rt",
        payload=["pay"], how="left", tolerance=50,
    ).collect()
    by_tag = {r["tag"]: r["pay"] for r in out_left}
    assert by_tag == {"p1": "v", "p2": None}  # 500-90=410 > 50 → no match
    out_inner = asof_join(
        left, right, key="k", left_ts="t", right_ts="rt",
        payload=["pay"], how="inner", tolerance=50,
    ).collect()
    assert [r["tag"] for r in out_inner] == ["p1"]


def test_asof_tolerance_exact_boundary_matches(spark):
    """left_ts - right_ts == tolerance is inside the window (<=)."""
    from big_data__instagram_analysis_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 150, "p")], "k long, t long, tag string")
    right = spark.createDataFrame([(1, 100, "v")], "k long, rt long, pay string")
    out = asof_join(
        left, right, key="k", left_ts="t", right_ts="rt",
        payload=["pay"], how="left", tolerance=50,
    ).collect()
    assert out[0]["pay"] == "v"
