"""Set operations (SURVEY.md §2.7 T1-T4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import query


def _active_custkeys(spark: SparkSession, sf_dir: str, year: int) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.where(F.year("o_orderdate") == year).select("o_custkey")


@query(
    "union_all_flags",
    category="T1",
    oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem WHERE l_returnflag = 'A'
UNION ALL
SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem WHERE l_returnflag = 'R'
""",
)
def union_all_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL via unionByName (bag semantics, no dedup shuffle)."""
    li = load(spark, sf_dir, "lineitem")
    cols = ["l_orderkey", "l_linenumber", "l_returnflag"]
    a = li.where(F.col("l_returnflag") == "A").select(*cols)
    r = li.where(F.col("l_returnflag") == "R").select(*cols)
    return a.unionByName(r)


@query(
    "union_distinct_nations",
    category="T2",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
""",
)
def union_distinct_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): nations present among customers or suppliers."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@query(
    "intersect_active_custs",
    category="T3",
    oracle="""
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
""",
)
def intersect_active_custs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in both years (INTERSECT = distinct semi-join)."""
    return _active_custkeys(spark, sf_dir, 1995).intersect(
        _active_custkeys(spark, sf_dir, 1996)
    )


@query(
    "except_churned_custs",
    category="T4",
    oracle="""
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
""",
)
def except_churned_custs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn: active in 1995 but not 1996 (EXCEPT = distinct anti-join).

    Note subtract() (distinct EXCEPT), not exceptAll().distinct(): EXCEPT
    drops a key present at all on the right; exceptAll keeps surplus
    multiplicity, a different relation."""
    return _active_custkeys(spark, sf_dir, 1995).subtract(
        _active_custkeys(spark, sf_dir, 1996)
    )


@query(
    "set_ops_all_multiplicity",
    category="T3,T4,E65",
    oracle="""
WITH a AS (SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 0),
     b AS (SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'BUILDING')
SELECT 'intersect_all' AS op, k, CAST(count(*) AS BIGINT) AS n
FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
GROUP BY k
UNION ALL
SELECT 'except_all' AS op, k, CAST(count(*) AS BIGINT) AS n
FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
GROUP BY k
ORDER BY op, k
""",
)
def set_ops_all_multiplicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL: bag (multiplicity-preserving) set
    semantics — T3/T4's DISTINCT forms answer membership, the ALL forms
    answer HOW MANY survive, which is what reconciliation jobs need
    (every unmatched duplicate is a discrepancy to count).

    Spark plans both as aggregate-count-then-replicate on the value —
    one shuffle keyed by the row value, same cost class as the DISTINCT
    forms; the generate step replays each value min/diff-count times.
    """
    c = load(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 0).select(F.col("c_nationkey").alias("k"))
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_nationkey").alias("k")
    )
    inter = (
        a.intersectAll(b)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "k", "n")
    )
    exc = (
        a.exceptAll(b)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "k", "n")
    )
    return inter.unionByName(exc).orderBy("op", "k")
