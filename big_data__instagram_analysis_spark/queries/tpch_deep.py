"""TPC-H-grade decorrelation family (SURVEY.md §2.12 E140-E145).

The E16 subquery family checks the SQL frontend frontend-to-frontend (the
same nested text on both engines). This family does the harder thing: each
query's ORACLE stays in classic nested-subquery TPC-H form (correlated
scalar agg, IN-over-HAVING, EXISTS/NOT-EXISTS double correlation, scalar
threshold + anti join, correlated MIN equality, HAVING vs global total),
while the SPARK side is the hand-decorrelated DataFrame plan you would
actually run at 100 TB — aggregate-then-equi-join, semi/anti joins, a
broadcast single-row threshold. The hash check then proves the distributed
rewrite is semantically identical to the nested form DuckDB evaluates.

Scale notes per query are in the docstrings; none contains a cartesian or
per-row re-execution — every correlation becomes one shuffle on an equi-key
or a broadcast of a 1-row/`tiny` aggregate.

Hash discipline (SURVEY.md §5.4): quantities are integer-valued doubles, so
SUM/AVG over them is exact IEEE (no order sensitivity); money thresholds are
compared in exact integer cents; sums of raw money follow the suite-wide
round-after-sum convention; dates emit as 'yyyy-MM-dd' strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..numeric import cents_sum
from ..registry import query

# --- E140: Q17 — small-quantity revenue (correlated scalar AVG) -------------

_Q17 = """
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS n_small,
       sum(CAST(floor((l.l_extendedprice) * 100 + 0.5) AS BIGINT)) / 100.0 AS small_revenue
FROM read_parquet_lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                      FROM read_parquet_lineitem l2
                      WHERE l2.l_partkey = l.l_partkey)
GROUP BY p.p_brand
ORDER BY p.p_brand
""".replace("read_parquet_lineitem", "lineitem")


@query("small_qty_revenue_q17", category="E140", oracle=_Q17)
def small_qty_revenue_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lines with quantity under half their part's mean,
    revenue by brand. Oracle = correlated scalar subquery; Spark side =
    the decorrelated plan: per-part AVG aggregate equi-joined back to
    lineitem on l_partkey.

    Scale: the correlation becomes ONE shuffle of lineitem on l_partkey
    (the aggregate reuses the same partitioning), never a per-row re-scan.
    Quantities are integer-valued doubles -> the AVG is exact IEEE
    (integer-exact partial sums), so the 0.5*avg threshold is
    order-insensitive and cross-engine stable.
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    per_part = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * F.lit(0.5)).alias("half_avg_qty")
    )
    small = (
        li.join(per_part, "l_partkey")
        .where(F.col("l_quantity") < F.col("half_avg_qty"))
    )
    return (
        small.join(part, small.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            cents_sum(F.col("l_extendedprice")).alias("small_revenue"),
        )
        .orderBy("p_brand")
    )


# --- E141: Q18 — large-volume orders (IN over GROUP BY ... HAVING) ----------

_Q18 = """
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o.o_totalprice, 2) AS totalprice,
       CAST(sum(l.l_quantity) AS BIGINT) AS total_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                       GROUP BY l_orderkey HAVING sum(l_quantity) > 140)
GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY totalprice DESC, o.o_orderkey
LIMIT 100
"""


@query("large_volume_orders_q18", category="E141", oracle=_Q18)
def large_volume_orders_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds 140, with
    customer context, top-100 by price. Oracle = IN over a grouped HAVING
    subquery (re-scans lineitem); Spark side computes the per-order
    quantity aggregate ONCE and reuses it as both the filter and the
    output column — the materialized-CTE rewrite Catalyst cannot do from
    the nested form because the subquery and outer aggregate differ.

    Scale: one lineitem shuffle on l_orderkey (the aggregate), then
    orders equi-join on the same key (>140 prunes ~75% before the join),
    customer join on c_custkey, TakeOrderedAndProject for the top-100.
    total_qty is an exact integer-valued double -> BIGINT cast is safe.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    totals = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("bigint").alias("total_qty"))
        .where(F.col("total_qty") > 140)
    )
    return (
        totals.join(o, totals.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )


# --- E142: Q21 — sole-fault supplier (EXISTS + NOT EXISTS, both correlated) -

_Q21 = """
SELECT s.s_suppkey, s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_suppkey, s.s_name
ORDER BY numwait DESC, s.s_suppkey
LIMIT 100
"""


@query("sole_returned_supplier_q21", category="E142", oracle=_Q21)
def sole_returned_supplier_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted to this schema's l_returnflag as the
    "failed" marker — the fixture has no receipt/commit dates): count, per
    supplier, returned lines in multi-supplier orders where NO other
    supplier's line was returned. Oracle = correlated EXISTS + NOT EXISTS;
    Spark side = left-semi then left-anti self-joins of lineitem on
    l_orderkey with the supplier-inequality carried as a join residual.

    Scale: both correlations are equi-joins on l_orderkey — three scans of
    lineitem shuffle on the same key (co-partitioned by AQE), group size
    bounded by lines-per-order (~7), so no skew blowup; the 'R' filters
    push into the scans. The supplier dim joins on s_suppkey at the end,
    after the fact table has been reduced to sole-fault lines.
    """
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    l1 = li.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = (
        li.where(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3"))
    )
    sole = (
        l1.join(
            l2,
            (l1.l_orderkey == l2.o2) & (l1.l_suppkey != l2.s2),
            "left_semi",
        )
        .join(
            l3,
            (l1.l_orderkey == F.col("o3")) & (l1.l_suppkey != F.col("s3")),
            "left_anti",
        )
    )
    return (
        sole.join(s, sole.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(100)
    )


# --- E143: Q22 — idle rich customers (scalar threshold + anti join) ---------

_Q22 = """
WITH avg_bal AS (
  SELECT avg(CAST(round(c_acctbal * 100) AS BIGINT)) AS cents
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS numcust,
       sum(CAST(floor((c.c_acctbal) * 100 + 0.5) AS BIGINT)) / 100.0 AS totacctbal
FROM customer c, avg_bal
WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) > avg_bal.cents
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority LIKE '1%')
GROUP BY c.c_mktsegment
ORDER BY segment
"""


@query("idle_rich_custs_q22", category="E143", oracle=_Q22)
def idle_rich_custs_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (priority prefix replaces the fixture-absent phone
    country code): customers with above-average positive balance and no
    URGENT order, counted per market segment. Oracle = scalar-subquery
    threshold + correlated NOT EXISTS; Spark side = 1-row aggregate
    broadcast via crossJoin + left-anti join on c_custkey.

    Scale: the threshold is a single global aggregate (one partial-agg
    pass, 8 bytes broadcast); the anti join shuffles on c_custkey with the
    '1%' priority filter pushed below it. The balance comparison runs in
    exact integer cents so the average-of-doubles is order-insensitive
    (integer partial sums are exact in IEEE) and can't flip a boundary row
    between engines.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    thresh = (
        c.where(F.col("c_acctbal") > 0)
        .agg(F.avg(cents).alias("cents"))
    )
    urgent = o.where(F.col("o_orderpriority").like("1%")).select("o_custkey")
    return (
        c.crossJoin(F.broadcast(thresh))
        .where(cents > F.col("cents"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            cents_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("segment")
    )


# --- E144: Q2 — min-cost supplier (correlated MIN equality) -----------------

_Q2 = """
WITH unit AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(floor(l_extendedprice / l_quantity * 100 + 0.5) AS BIGINT))
           AS unit_cents
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT u.l_partkey AS partkey, u.l_suppkey AS suppkey,
       u.unit_cents, round(u.unit_cents / 100.0, 2) AS unit_price
FROM unit u
WHERE u.unit_cents = (SELECT min(u2.unit_cents) FROM unit u2
                      WHERE u2.l_partkey = u.l_partkey)
ORDER BY partkey, suppkey
"""


@query("min_unitprice_supplier_q2", category="E144", oracle=_Q2)
def min_unitprice_supplier_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape over this schema (lineitem stands in for partsupp):
    for each part, the supplier(s) offering the minimum observed unit
    price — ties kept, exactly as Q2's correlated `= (SELECT min ...)`
    demands. Oracle = correlated MIN equality; Spark side = per-part MIN
    aggregate equi-joined back with an equality residual.

    Scale: one shuffle on (l_partkey, l_suppkey) for the unit-price
    aggregate, then a per-part MIN that reuses the l_partkey partitioning,
    then an equi-join on l_partkey — no window over the full fact table
    and no correlated re-scan. Unit prices convert to exact integer cents
    via floor(x*100 + 0.5) BEFORE the MIN: engine round() half-boundary
    behavior diverges on doubles (Spark HALF_UP vs DuckDB's rint-style —
    observed 120.88 vs 120.89 at sf0.01), while floor over the identical
    IEEE quotient is bit-deterministic, so the MIN equality and ties are
    cross-engine exact.
    """
    li = load(spark, sf_dir, "lineitem")
    unit_cents = F.floor(
        F.col("l_extendedprice") / F.col("l_quantity") * 100 + F.lit(0.5)
    ).cast("bigint")
    unit = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(unit_cents).alias("unit_cents")
    )
    per_part_min = unit.groupBy("l_partkey").agg(
        F.min("unit_cents").alias("min_cents")
    )
    return (
        unit.join(per_part_min, "l_partkey")
        .where(F.col("unit_cents") == F.col("min_cents"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
            "unit_cents",
            F.round(F.col("unit_cents") / 100.0, 2).alias("unit_price"),
        )
        .orderBy("partkey", "suppkey")
    )


# --- E145: Q11 — nation value share (HAVING vs global scalar total) ---------

_Q11 = """
WITH val AS (
  SELECT s.s_nationkey AS nationkey,
         sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS value_cents
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY s.s_nationkey
)
SELECT v.nationkey, CAST(v.value_cents AS BIGINT) AS value_cents,
       round(v.value_cents / 100.0, 2) AS value_usd
FROM val v
WHERE v.value_cents * 100 > (SELECT sum(value_cents) FROM val)
ORDER BY v.value_cents DESC, v.nationkey
"""


@query("nation_value_share_q11", category="E145", oracle=_Q11)
def nation_value_share_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: nations holding more than 1% of total line value.
    Oracle = HAVING against a scalar-subquery global total over the same
    CTE; Spark side computes the per-nation aggregate once, derives the
    global total FROM it (a rollup of 25 rows, not a second fact scan),
    and broadcasts the 1-row total into the filter.

    Scale: one lineitem⋈supplier shuffle on l_suppkey, one partial-agg
    shuffle on s_nationkey (25 groups), then driver-free comparison via
    crossJoin(broadcast(1 row)). Money is summed in exact integer cents
    and the 1% test is integer math (value*100 > total) — no float
    boundary can flip between engines.
    """
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    val = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.sum(cents).alias("value_cents"))
    )
    total = val.agg(F.sum("value_cents").alias("total_cents"))
    return (
        val.crossJoin(F.broadcast(total))
        .where(F.col("value_cents") * 100 > F.col("total_cents"))
        .select(
            "nationkey",
            "value_cents",
            F.round(F.col("value_cents") / 100.0, 2).alias("value_usd"),
        )
        .orderBy(F.desc("value_cents"), "nationkey")
    )
