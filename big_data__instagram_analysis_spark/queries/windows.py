"""Window function queries (SURVEY.md §2.5 W1, W3-W6; W2 in core.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load
from ..operators.windows import two_sided_value_band
from ..registry import query


@query(
    "ranking_functions",
    category="W1",
    oracle="""
SELECT c_custkey, c_nationkey, c_acctbal,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       CAST(rank()       OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       CAST(ntile(4)     OVER w AS BIGINT) AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
""",
)
def ranking_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile per nation, fully tie-broken."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@query(
    "lag_lead_gaps",
    category="W3",
    oracle="""
WITH t AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
  FROM events
)
SELECT event_id, user_id, ts_sec,
       ts_sec - lag(ts_sec) OVER w AS gap_sec,
       lead(event_type) OVER w     AS next_type
FROM t
WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
""",
)
def lag_lead_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap (lag) and next action (lead) per user. Timestamps are
    floored to epoch seconds on BOTH engines before any arithmetic — the ns
    vs µs precision mismatch makes raw ts diffs unhashable (SURVEY.md §5.4);
    ordering ties broken by event_id."""
    e = load(spark, sf_dir, "events")
    t = e.select(
        "event_id", "user_id", "event_type", F.col("ts").cast("long").alias("ts_sec")
    )
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    return t.select(
        "event_id",
        "user_id",
        "ts_sec",
        (F.col("ts_sec") - F.lag("ts_sec").over(w)).alias("gap_sec"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@query(
    "first_last_order",
    category="W4",
    oracle="""
SELECT DISTINCT o_custkey,
       strftime(first_value(o_orderdate) OVER w, '%Y-%m-%d') AS first_date,
       strftime(last_value(o_orderdate)  OVER w, '%Y-%m-%d') AS last_date,
       first_value(o_orderkey) OVER w AS first_orderkey,
       last_value(o_orderkey)  OVER w AS last_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def first_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last over an explicit unbounded frame (the default frame would
    make last_value see only up to the current row)."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        F.date_format(F.first("o_orderdate").over(w), "yyyy-MM-dd").alias("first_date"),
        F.date_format(F.last("o_orderdate").over(w), "yyyy-MM-dd").alias("last_date"),
        F.first("o_orderkey").over(w).alias("first_orderkey"),
        F.last("o_orderkey").over(w).alias("last_orderkey"),
    ).distinct()


@query(
    "running_revenue",
    category="W5",
    oracle="""
SELECT o_custkey, o_orderkey,
       sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS running_spend,
       round(avg(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS moving_avg_7
FROM orders
""",
)
def running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum + 7-row moving average (ROWS frames). Frame order is
    total (date + key tiebreak) so both engines fold in the same order."""
    o = load(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cum = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = base.rowsBetween(-6, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
            ).over(cum)
            / 100.0
        ).alias("running_spend"),
        F.round(F.avg("o_totalprice").over(mov), 4).alias("moving_avg_7"),
    )


@query(
    "trailing_hour_value",
    category="W6",
    oracle="""
WITH t AS (
  SELECT event_id, user_id, value,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
  FROM events
)
SELECT event_id, user_id, ts_sec,
       sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts_sec
         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) / 100.0 AS trailing_1h_value,
       CAST(count(*) OVER (
         PARTITION BY user_id ORDER BY ts_sec
         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT) AS trailing_1h_events
FROM t
""",
)
def trailing_hour_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: trailing-1-hour sum/count per user.
    RANGE includes ts_sec peers in the frame on both engines, so ties need
    no break; epoch-second flooring avoids the ns/µs mismatch."""
    e = load(spark, sf_dir, "events")
    t = e.select("event_id", "user_id", "value", F.col("ts").cast("long").alias("ts_sec"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return t.select(
        "event_id",
        "user_id",
        "ts_sec",
        (
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")).over(w)
            / 100.0
        ).alias("trailing_1h_value"),
        F.count(F.lit(1)).over(w).cast("long").alias("trailing_1h_events"),
    )


@query(
    "distribution_functions",
    category="W1,E40",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist()    OVER w, 6) AS cdist
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
ORDER BY o_orderpriority, pct_rank, o_orderkey
""",
)
def distribution_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist: relative standing within a partition —
    the windowed form of 'what percentile is this order in its priority
    class'. Fully tie-broken ordering (totalprice, then orderkey) so both
    engines agree on every rank; one shuffle on the partition key.
    """
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
        )
        .orderBy("o_orderpriority", "pct_rank", "o_orderkey")
    )


@query(
    "value_range_frame_peers",
    category="W6,E72",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       round(o_totalprice, 2) AS price,
       CAST(count(*) OVER w AS BIGINT) AS n_peers,
       sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER w / 100.0
         AS band_total
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
             RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING)
ORDER BY o_orderpriority, o_totalprice, o_orderkey
""",
)
def value_range_frame_peers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-range window frame: each order's peer group is every order
    within ±10,000 of its own price (same priority class) — RANGE frames
    keyed on a numeric measure, not time (W6) and not row offsets (W5).

    Price-band peer stats answer 'how crowded is this price point'
    without pre-binning (E33 would quantize the neighborhoods). RANGE
    frames are tie-safe by construction — equal prices always share one
    frame, so the result is deterministic without a tiebreak column in
    the frame spec. One exchange on the partition key; the in-partition
    frame scan is the sorted-run sliding window.

    DELIBERATE O(n·w) demo: this is the W6 semantics showcase. The scale
    path is ``value_band_prefix_totals`` (E220, below) — the same band
    totals via the two_sided_value_band prefix-sum decomposition, no
    sliding frame, hash-equal at two SFs.
    """
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, 10000)
    )
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.round("o_totalprice", 2).alias("price"),
            F.count(F.lit(1)).over(w).alias("n_peers"),
            (
                F.sum(
                    F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
                ).over(w)
                / 100.0
            ).alias("band_total"),
        )
        .orderBy("o_orderpriority", "price", "o_orderkey")
    )


# --- E220: two-sided value band via prefix sums (the W6 scale path) -----------


@query(
    "value_band_prefix_totals",
    category="W6,E220",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       round(o_totalprice, 2) AS price,
       CAST(count(*) OVER w AS BIGINT) AS n_peers,
       sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER w / 100.0
         AS band_total
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
             RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING)
ORDER BY o_orderpriority, o_totalprice, o_orderkey
""",
)
def value_band_prefix_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ±10,000 price-band peer stats of value_range_frame_peers,
    recomputed WITHOUT a two-sided RANGE frame — the 100 TB path PERF.md
    §41 measured the need for: Spark's SlidingWindowFunctionFrame has no
    aggregate retraction, so a two-sided RANGE frame re-aggregates its full
    frame per row (O(n·w); 3.7 s vs DuckDB's 0.11 s segment-tree at sf0.1).

    Decomposition: band(p) = prefix(p+10000) − prefix(<p−10000), with both
    prefixes read off ONE incremental running window. Each order emits its
    anchor row (key=price, tag=1, carrying cents/count contributions) plus
    two zero-contribution probe rows (key=price+10000 tag=2, key=price−10000
    tag=0). Sorting by (key, tag) places a lo-probe BEFORE anchors at the
    identical key (an order at exactly price−10000 is inside the band, so
    it must not be subtracted) and a hi-probe AFTER anchors at the
    identical key (exactly price+10000 is inside) — the frame's closed
    bounds fall out of the tag order, with no epsilon arithmetic. The
    running ROWS-UNBOUNDED-PRECEDING sums are O(1)/row (Spark's unbounded-
    preceding frame IS incremental), so total work is the sort: O(n log n)
    vs O(n·w). Probe keys use the same double arithmetic (price ± 10000)
    DuckDB's RANGE bounds use, so the boundary set is bit-identical —
    hash-equal to the RANGE-frame form by construction (pinned by
    tests/test_windows_prefix.py at two scale factors).

    Shape: 3n-row union (one pruned scan), one sort-shuffle on
    (priority, key, tag), one re-key shuffle on o_orderkey to zip the two
    probes back together. No join back to the base table — probes carry
    (priority, price) through.
    """
    return band_prefix_totals(load(spark, sf_dir, "orders"))


def band_prefix_totals(orders: DataFrame) -> DataFrame:
    """Prefix-sum two-sided value band over (o_orderkey, o_orderpriority,
    o_totalprice) — the fixture instantiation of the reusable
    operators/windows.py::two_sided_value_band decomposition; split out so
    tests can drive it with hand-built boundary fixtures."""
    banded = two_sided_value_band(
        orders,
        id_col="o_orderkey",
        partition_by=["o_orderpriority"],
        value_col="o_totalprice",
        radius=10000.0,
        contribs={
            "cents": F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)),
        },
    )
    return banded.select(
        "o_orderkey",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("price"),
        F.col("band_n").alias("n_peers"),
        (F.col("cents") / 100.0).alias("band_total"),
    ).orderBy("o_orderpriority", "price", "o_orderkey")


# --- E201: nth_value accessor -------------------------------------------------


@query(
    "nth_value_second_order",
    category="W4,E201",
    oracle="""
WITH w AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         nth_value(round(o_totalprice, 2), 2) OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
         ) AS second_best,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY o_custkey) AS n_orders
  FROM orders
)
SELECT o_custkey, CAST(n_orders AS BIGINT) AS n_orders,
       round(o_totalprice, 2) AS best, second_best
FROM w
WHERE rn = 1
ORDER BY o_custkey
""",
)
def nth_value_second_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value: each customer's second-highest order price alongside the
    best — the runner-up accessor rank-then-self-join would need two
    passes for. NULL when the customer has a single order (nth_value's
    out-of-frame contract, hash-checked).

    Scale: one shuffle on the window partition key; the full-partition
    frame is fine because per-customer order counts are bounded (~10).
    The (price DESC, orderkey) order is total, so 'second' is
    engine-independent at price ties.
    """
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wp = Window.partitionBy("o_custkey")
    return (
        o.select(
            "o_custkey",
            "o_totalprice",
            F.nth_value(F.round("o_totalprice", 2), 2).over(wf).alias(
                "second_best"
            ),
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wp).alias("n_orders"),
        )
        .where(F.col("rn") == 1)
        .select(
            "o_custkey",
            "n_orders",
            F.round("o_totalprice", 2).alias("best"),
            "second_best",
        )
        .orderBy("o_custkey")
    )
