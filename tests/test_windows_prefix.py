"""value_band_prefix_totals (E220): the prefix-sum decomposition must be
row-identical to the two-sided RANGE frame it replaces at scale, and its
plan must contain NO sliding RANGE frame (that recompute cost is the whole
reason it exists — PERF.md §41)."""

from __future__ import annotations

from big_data__instagram_analysis_spark.queries.windows import band_prefix_totals
from big_data__instagram_analysis_spark.registry import get_specs


def _pdf(spark, sf_dir, name):
    return get_specs()[name].fn(spark, sf_dir).toPandas()


def test_prefix_totals_equal_range_frame(spark, sf_dir):
    a = _pdf(spark, sf_dir, "value_range_frame_peers")
    b = _pdf(spark, sf_dir, "value_band_prefix_totals")
    assert list(a.columns) == list(b.columns)
    a = a.sort_values(list(a.columns)).reset_index(drop=True)
    b = b.sort_values(list(b.columns)).reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    for col in a.columns:
        assert a[col].tolist() == b[col].tolist(), col


def test_prefix_totals_boundary_inclusive_both_sides(spark):
    """Hand-built frame where orders sit EXACTLY ±10,000 apart: closed
    RANGE bounds mean both neighbors are peers of the middle row. This is
    the tie case the (key, tag) sort ordering exists for — an epsilon
    mistake on either side drops a boundary peer."""
    rows = [
        (1, "P", 10000.0),
        (2, "P", 20000.0),
        (3, "P", 30000.0),
        (4, "P", 50000.0),  # outside every band
        (5, "Q", 20000.0),  # other partition: must not leak into P's bands
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    )
    out = {
        r["o_orderkey"]: (r["n_peers"], r["band_total"])
        for r in band_prefix_totals(df).collect()
    }
    assert out[1] == (2, 30000.0)  # itself + the 20000 boundary peer
    assert out[2] == (3, 60000.0)  # all three, boundary-inclusive both sides
    assert out[3] == (2, 50000.0)
    assert out[4] == (1, 50000.0)
    assert out[5] == (1, 20000.0)


def test_prefix_totals_plan_has_no_sliding_range_frame(spark, sf_dir):
    df = get_specs()["value_band_prefix_totals"].fn(spark, sf_dir)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    ).lower().replace(" ", "")
    assert "rangeframe" not in plan, "prefix form must not plan a RANGE frame"
    assert "unboundedpreceding" in plan, "running prefix window missing"


# --- differential fuzz: prefix decomposition vs python brute force -----------

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# Prices drawn from a lattice of exact 2,500-steps so ±10,000 boundary
# collisions (the tie cases the tag ordering handles) occur constantly,
# plus duplicate prices within and across priorities.
price = st.integers(min_value=0, max_value=20).map(lambda k: k * 2500.0)
row = st.tuples(st.sampled_from(["A", "B"]), price)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(row, min_size=1, max_size=14))
def test_prefix_band_equals_bruteforce(spark, rows):
    data = [(i, prio, p) for i, (prio, p) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "o_orderkey long, o_orderpriority string, o_totalprice double"
    )
    got = {
        r["o_orderkey"]: (r["n_peers"], r["band_total"])
        for r in band_prefix_totals(df).collect()
    }
    assert set(got) == {i for i, _, _ in data}
    for okey, prio, p in data:
        peers = [
            (k, q)
            for k, pr, q in data
            if pr == prio and p - 10000.0 <= q <= p + 10000.0
        ]
        n = len(peers)
        total = sum(int(q * 100 + 0.5) for _, q in peers) / 100.0
        assert got[okey] == (n, total), (okey, p, prio, got[okey], (n, total))
