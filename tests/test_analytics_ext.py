"""Tests for the E164-E175 analytics extensions beyond oracle parity.

- asof_join_nearest is differentially fuzzed against pandas.merge_asof
  (direction='nearest', same tolerance) — a second independent oracle, the
  same strategy test_asof_hypothesis.py uses for the backward join. pandas
  also prefers backward on exact-distance ties, so agreement is exact.
- weighted_median_unitprice is property-checked against the defining
  inequalities of the lower weighted median, recomputed in pandas from the
  raw fixture (not from the query's own intermediate state).
- cumulative_new_users invariants: the final cumulative count equals the
  distinct-user total, the series is monotone, and actives bound news.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data__instagram_analysis_spark.operators.asof import asof_join_nearest
from big_data__instagram_analysis_spark.registry import get_specs

row = st.tuples(
    st.integers(min_value=0, max_value=3),   # key
    st.integers(min_value=0, max_value=50),  # ts
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left_rows=st.lists(row, min_size=1, max_size=15),
    right_rows=st.lists(row, min_size=1, max_size=15, unique=True),
    tol=st.integers(min_value=0, max_value=60),
)
def test_nearest_matches_pandas_merge_asof(spark, left_rows, right_rows, tol):
    right_dedup = {}
    for i, (k, t) in enumerate(right_rows):
        right_dedup[(k, t)] = float(i)
    right_pdf = pd.DataFrame(
        [(k, t, v) for (k, t), v in sorted(right_dedup.items())],
        columns=["key", "ts", "payload"],
    )
    left_pdf = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)],
        columns=["rid", "key", "ts"],
    )

    expected = pd.merge_asof(
        left_pdf.sort_values("ts", kind="stable"),
        right_pdf.sort_values("ts", kind="stable"),
        on="ts",
        by="key",
        direction="nearest",
        tolerance=tol,
    ).dropna(subset=["payload"])

    left = spark.createDataFrame(left_pdf, "rid long, key long, ts long")
    right = spark.createDataFrame(right_pdf, "key long, ts long, payload double")
    got = (
        asof_join_nearest(
            left,
            right,
            key="key",
            left_ts="ts",
            right_ts="ts",
            payload=["payload"],
            tolerance=tol,
        )
        .select("rid", "payload")
        .toPandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    exp = (
        expected[["rid", "payload"]]
        .sort_values("rid")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_weighted_median_defining_inequalities(spark, sf_dir):
    """The lower weighted median m must satisfy, per group:
    sum(w | v < m) < tot/2  and  sum(w | v <= m) >= tot/2 — recomputed
    from the raw lineitem fixture in pandas."""
    import math

    res = (
        get_specs()["weighted_median_unitprice"].fn(spark, sf_dir).toPandas()
    )
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    li["unit_cents"] = (
        li.l_extendedprice / li.l_quantity * 100 + 0.5
    ).apply(math.floor).astype("int64")
    li["w"] = li.l_quantity.astype("int64")
    assert len(res) > 0
    for _, r in res.iterrows():
        g = li[li.l_returnflag == r.flag]
        tot = int(g.w.sum())
        assert tot == int(r.total_weight)
        below = int(g.loc[g.unit_cents < r.wmedian_cents, "w"].sum())
        at_or_below = int(g.loc[g.unit_cents <= r.wmedian_cents, "w"].sum())
        assert 2 * below < tot, (r.flag, below, tot)
        assert 2 * at_or_below >= tot, (r.flag, at_or_below, tot)
        # The median must be an actually-observed value.
        assert (g.unit_cents == r.wmedian_cents).any()


def test_cumulative_new_users_invariants(spark, sf_dir):
    res = get_specs()["cumulative_new_users"].fn(spark, sf_dir).toPandas()
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    assert int(res.cum_users.iloc[-1]) == e.user_id.nunique()
    assert res.cum_users.is_monotonic_increasing
    assert (res.n_active >= res.n_new).all()
    assert int(res.n_new.sum()) == e.user_id.nunique()


def test_containment_dominates_jaccard_and_planted_pair(spark, sf_dir):
    """containment >= jaccard always (denominator is smaller); and a planted
    doc fully contained in a bigger one must be flagged with containment 1.0
    even though its Jaccard is far below the threshold."""
    import pandas as pd
    from big_data__instagram_analysis_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    res = (
        get_specs()["containment_neardup_pairs"].fn(spark, sf_dir).toPandas()
    )
    assert len(res) > 0
    assert (res.containment >= res.jaccard - 1e-9).all()
    assert (res.containment >= 0.8 - 1e-9).all()

    small = "alpha beta gamma delta epsilon zeta"
    big = " ".join(["x%d y%d" % (i, i) for i in range(40)]) + " " + small
    df = spark.createDataFrame(
        [(1, small), (2, big)], "doc_id long, text string"
    )
    planted = ngram_containment_pairs(df, n=3, threshold=0.8).toPandas()
    assert len(planted) == 1
    row = planted.iloc[0]
    assert row.doc_small == 1 and row.doc_big == 2
    assert abs(row.containment - 1.0) < 1e-9
    assert row.jaccard < 0.5  # Jaccard alone would have missed it


def test_bpe_pair_count_identity(spark, sf_dir):
    """Total adjacent-pair occurrences across the corpus must equal
    sum(len(tokens) - 1) over docs with >= 2 tokens — the pairing step
    loses or invents nothing (checked on totals, not just the top-50)."""
    import pandas as pd

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = docs.text.str.split(" ").apply(lambda ws: [w for w in ws if w])
    expected_total = int(sum(max(len(t) - 1, 0) for t in toks))

    from pyspark.sql import functions as F
    from big_data__instagram_analysis_spark.io import load

    d = load(spark, sf_dir, "documents")
    tarr = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    got = (
        d.select(
            F.greatest(F.size(tarr) - 1, F.lit(0)).alias("n_pairs")
        )
        .agg(F.sum("n_pairs"))
        .collect()[0][0]
    )
    assert int(got) == expected_total


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),    # group
            st.integers(min_value=1, max_value=30),   # value (cents stand-in)
            st.integers(min_value=1, max_value=9),    # weight
        ),
        min_size=1,
        max_size=40,
    )
)
def test_weighted_median_fuzz_vs_reference(spark, rows):
    """Differential fuzz of the compact-then-cumsum weighted-median plan
    against a direct python reference (sort values, walk cumulative weight
    to half total) on random grouped integer data."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    df = spark.createDataFrame(rows, "g int, v long, w long")
    grouped = df.groupBy("g", "v").agg(F.sum("w").alias("w"))
    wc = W.partitionBy("g").orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    wt = W.partitionBy("g")
    cum = grouped.select(
        "g", "v", F.sum("w").over(wc).alias("cw"), F.sum("w").over(wt).alias("tot")
    )
    got = {
        r.g: r.m
        for r in cum.where(2 * F.col("cw") >= F.col("tot"))
        .groupBy("g")
        .agg(F.min("v").alias("m"))
        .collect()
    }

    by_group: dict[int, dict[int, int]] = {}
    for g, v, w in rows:
        by_group.setdefault(g, {}).setdefault(v, 0)
        by_group[g][v] += w
    for g, vw in by_group.items():
        tot = sum(vw.values())
        acc = 0
        ref = None
        for v in sorted(vw):
            acc += vw[v]
            if 2 * acc >= tot:
                ref = v
                break
        assert got[g] == ref, (g, got[g], ref, vw)


def test_compaction_bins_respect_target(spark, sf_dir):
    """Every compaction bin except possibly the last must stop once it
    reaches the 8k-row target (prefix-sum binning property), and bins must
    partition the files exactly (no file lost or duplicated)."""
    res = (
        get_specs()["small_file_compaction_plan"].fn(spark, sf_dir).toPandas()
    )
    assert res.bin_id.is_monotonic_increasing
    all_files = ",".join(res.file_idxs).split(",")
    assert len(all_files) == len(set(all_files)) == int(res.n_files.sum())
    # A bin only opens when the previous one has reached the target.
    cum = 0
    for _, r in res.sort_values("bin_id").iterrows():
        if r.bin_id > 0:
            assert cum >= 8000 * r.bin_id, (r.bin_id, cum)
        cum += int(r.total_rows)


def test_epoch_replication_count_law(spark, sf_dir):
    """replicated = floor(epochs)*n_docs + |fractional md5 subset|, and the
    fractional subset size must be plausible for its rate (exactly
    recomputable, so equality — not a CI — is asserted)."""
    import hashlib

    import pandas as pd

    res = (
        get_specs()["source_epoch_replication"].fn(spark, sf_dir).toPandas()
    )
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")

    def epochs(src):
        if src in ("src0", "src1"):
            return 2.5
        if src in ("src2", "src3"):
            return 1.25
        return 1.0

    for _, r in res.iterrows():
        grp = docs[docs.source == r.source]
        e = epochs(r.source)
        base = int(e) * len(grp)
        frac_pct = round((e - int(e)) * 100)
        picked = 0
        if frac_pct:
            for doc_id in grp.doc_id:
                h = hashlib.md5(str(doc_id).encode()).hexdigest()[:8]
                if int(h, 16) % 100 < frac_pct:
                    picked += 1
        assert int(r.replicated_docs) == base + picked, r.source


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left_rows=st.lists(row, min_size=1, max_size=15),
    right_rows=st.lists(row, min_size=1, max_size=15, unique=True),
    tol=st.integers(min_value=0, max_value=40),
)
def test_backward_asof_tolerance_matches_pandas(spark, left_rows, right_rows, tol):
    """The BACKWARD as-of tolerance path (the attribution-window semantic,
    operators/asof.py) vs pandas merge_asof(direction='backward',
    tolerance=...) — the no-tolerance form is fuzzed in
    test_asof_hypothesis.py; this pins the lookback bound."""
    from big_data__instagram_analysis_spark.operators.asof import asof_join

    right_dedup = {}
    for i, (k, t) in enumerate(right_rows):
        right_dedup[(k, t)] = float(i)
    right_pdf = pd.DataFrame(
        [(k, t, v) for (k, t), v in sorted(right_dedup.items())],
        columns=["key", "ts", "payload"],
    )
    left_pdf = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)],
        columns=["rid", "key", "ts"],
    )
    expected = pd.merge_asof(
        left_pdf.sort_values("ts", kind="stable"),
        right_pdf.sort_values("ts", kind="stable"),
        on="ts",
        by="key",
        direction="backward",
        tolerance=tol,
    ).dropna(subset=["payload"])

    left = spark.createDataFrame(left_pdf, "rid long, key long, ts long")
    right = spark.createDataFrame(right_pdf, "key long, ts long, payload double")
    got = (
        asof_join(
            left,
            right,
            key="key",
            left_ts="ts",
            right_ts="ts",
            payload=["payload"],
            how="inner",
            tolerance=tol,
        )
        .select("rid", "payload")
        .toPandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    exp = expected[["rid", "payload"]].sort_values("rid").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(
        st.integers(min_value=1, max_value=5000), min_size=1, max_size=20
    ),
    target=st.integers(min_value=100, max_value=6000),
)
def test_prefix_sum_binning_law_fuzz(spark, sizes, target):
    """The compaction planner's prefix-sum floor-divide binning, fuzzed on
    random file-size distributions: bins are contiguous, partition the
    file set exactly, and a new bin only opens once the cumulative rows
    before it reach bin_id * target."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(sizes)], "file_idx int, n_rows long"
    )
    w = W.orderBy("file_idx").rowsBetween(W.unboundedPreceding, 0)
    binned = df.withColumn(
        "bin_id",
        F.floor((F.sum("n_rows").over(w) - F.col("n_rows")) / target).cast(
            "bigint"
        ),
    ).collect()

    assigned = sorted((r.file_idx, r.bin_id, r.n_rows) for r in binned)
    assert [a[0] for a in assigned] == list(range(len(sizes)))
    cum = 0
    prev_bin = 0
    for fi, b, n in assigned:
        assert b >= prev_bin, "bins must be non-decreasing over file order"
        assert b == cum // target, (fi, b, cum, target)
        cum += n
        prev_bin = b


def test_poisson_bootstrap_ci_brackets_point_mean(spark, sf_dir):
    """E233: the 95% bootstrap CI must bracket the full-sample mean and be
    non-degenerate (lo < hi), and replicate means must concentrate near
    the point estimate (width well under 50% of the mean at any SF)."""
    from big_data__instagram_analysis_spark.registry import get_specs

    r = (
        get_specs()["poisson_bootstrap_ci"]
        .fn(spark, str(sf_dir))
        .toPandas()
        .iloc[0]
    )
    assert r.ci_lo_cents < r.ci_hi_cents
    assert r.ci_lo_cents <= r.point_mean_cents <= r.ci_hi_cents
    assert (r.ci_hi_cents - r.ci_lo_cents) < 0.5 * r.point_mean_cents
