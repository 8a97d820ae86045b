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


# --- the reusable operator form (operators/windows.py) ------------------------

from pyspark.sql import functions as F

from big_data__instagram_analysis_spark.operators.windows import (
    two_sided_value_band,
)


def test_operator_generic_schema_two_contribs(spark):
    """two_sided_value_band on a non-orders schema, two contribution
    columns, multi-column partitioning — the reusability the E220 query
    alone can't demonstrate. Brute-forced in python."""
    data = [
        (i, src, grp, float(v), w)
        for i, (src, grp, v, w) in enumerate(
            [
                ("web", "x", 10, 1),
                ("web", "x", 15, 2),
                ("web", "x", 20, 4),
                ("web", "x", 31, 8),
                ("web", "y", 12, 16),
                ("app", "x", 10, 32),
                ("app", "x", 10, 64),
            ]
        )
    ]
    df = spark.createDataFrame(
        data, "rid long, src string, grp string, score double, wt long"
    )
    out = two_sided_value_band(
        df,
        id_col="rid",
        partition_by=["src", "grp"],
        value_col="score",
        radius=5.0,
        contribs={
            "wt_sum": F.col("wt"),
            "score_cents": F.floor(F.col("score") * 100 + F.lit(0.5)),
        },
    )
    assert out.columns == [
        "rid", "src", "grp", "score", "band_n", "wt_sum", "score_cents",
    ]
    got = {r["rid"]: r.asDict() for r in out.collect()}
    assert set(got) == {i for i, *_ in data}
    for rid, src, grp, v, _ in data:
        band = [
            (q, w2)
            for _, s2, g2, q, w2 in data
            if (s2, g2) == (src, grp) and v - 5.0 <= q <= v + 5.0
        ]
        r = got[rid]
        assert (r["src"], r["grp"], r["score"]) == (src, grp, v)
        assert r["band_n"] == len(band), rid
        assert r["wt_sum"] == sum(w2 for _, w2 in band), rid
        assert r["score_cents"] == sum(int(q * 100 + 0.5) for q, _ in band), rid


def test_operator_plan_has_no_sliding_frame(spark):
    """The operator's whole point: its plan must contain no sliding
    (RANGE or bounded-ROWS two-sided) window frame, only incremental
    UNBOUNDED-PRECEDING running frames."""
    df = spark.createDataFrame(
        [(1, "a", 1.0, 1)], "rid long, g string, v double, w long"
    )
    out = two_sided_value_band(
        df,
        id_col="rid",
        partition_by=["g"],
        value_col="v",
        radius=2.0,
        contribs={"w_sum": F.col("w")},
    )
    plan = spark._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    ).lower().replace(" ", "")
    assert "rangeframe" not in plan
    assert "unboundedpreceding" in plan


def test_operator_rejects_reserved_names(spark):
    df = spark.createDataFrame([(1, "a", 1.0)], "rid long, g string, v double")
    with pytest.raises(ValueError, match="reserved"):
        two_sided_value_band(
            df,
            id_col="rid",
            partition_by=["g"],
            value_col="v",
            radius=1.0,
            contribs={"_band_key": F.lit(1)},
        )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["A", "B"]),
            st.sampled_from(["x", "y"]),
            st.integers(min_value=0, max_value=12).map(lambda k: k * 2.5),
            st.integers(min_value=-5, max_value=5),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_operator_band_equals_bruteforce(spark, rows):
    """Hypothesis differential for the GENERIC operator: multi-column
    partitions, a signed contribution, radius-5 closed bands on a 2.5-step
    value lattice (boundary collisions constantly)."""
    data = [(i, g1, g2, v, w) for i, (g1, g2, v, w) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "rid long, g1 string, g2 string, v double, w long"
    )
    out = two_sided_value_band(
        df,
        id_col="rid",
        partition_by=["g1", "g2"],
        value_col="v",
        radius=5.0,
        contribs={"w_sum": F.col("w")},
    )
    got = {r["rid"]: (r["band_n"], r["w_sum"]) for r in out.collect()}
    assert set(got) == {i for i, *_ in data}
    for rid, g1, g2, v, _ in data:
        band = [
            (q, w2)
            for _, h1, h2, q, w2 in data
            if (h1, h2) == (g1, g2) and v - 5.0 <= q <= v + 5.0
        ]
        assert got[rid] == (len(band), sum(w2 for _, w2 in band)), (rid, v)
