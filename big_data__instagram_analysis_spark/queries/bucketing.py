"""Bucketed co-located join (SURVEY.md §4 / 100 TB playbook made concrete).

At 100 TB the single biggest join cost is shuffling the fact tables on the
join key for every query. Bucketing amortizes that: write each fact
`bucketBy(N, key)` once, and every subsequent equi-join/aggregation on that
key reads co-located buckets with NO exchange. This module materializes
bucketed copies of orders+customer into the local spark-warehouse (once per
(sf, bucket-count)) and runs the join; tests/test_plans.py asserts the
executed plan contains zero shuffle exchanges on the fact side.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load, scratch_dir
from ..numeric import cents_sum
from ..registry import query

N_BUCKETS = 8


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Materialize bucketed orders/customer tables once; return their names."""
    key = hashlib.sha256(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    t_orders = f"b_orders_{key}"
    t_cust = f"b_customer_{key}"
    # External tables at an explicit scratch path: spark.sql.warehouse.dir is
    # a static conf, so the bucketed data lives under .scratch/ instead.
    existing = {t.name for t in spark.catalog.listTables()}
    if t_orders not in existing:
        load(spark, sf_dir, "orders").write.bucketBy(N_BUCKETS, "o_custkey").sortBy(
            "o_custkey"
        ).option("path", scratch_dir(f"bucketed/{t_orders}")).mode(
            "overwrite"
        ).saveAsTable(t_orders)
    if t_cust not in existing:
        load(spark, sf_dir, "customer").write.bucketBy(N_BUCKETS, "c_custkey").sortBy(
            "c_custkey"
        ).option("path", scratch_dir(f"bucketed/{t_cust}")).mode(
            "overwrite"
        ).saveAsTable(t_cust)
    return t_orders, t_cust


@query(
    "bucketed_join_order_totals",
    category="J1,S7,E4",
    oracle="""
SELECT c.c_mktsegment,
       count(*) AS n_orders,
       sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0 AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
""",
)
def bucketed_join_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders⋈customer on the bucket key: a shuffle-free co-located join.

    Both sides are bucketed(8, custkey) at write time, so the join planner
    matches output partitionings and emits SortMergeJoin with NO Exchange on
    either side — the plan shape that makes repeated fact-fact joins viable
    at 100 TB (verified by tests/test_plans.py::test_bucketed_join_has_no_
    fact_shuffle). Results are oracle-identical to the plain parquet join.
    """
    t_orders, t_cust = _bucketed_tables(spark, sf_dir)
    # Disable auto-broadcast so the bucketed SMJ path (the thing being
    # demonstrated — at 100 TB neither side broadcasts) is what executes even
    # on the tiny fixture. Planning is lazy, so the conf must stay set until
    # the action runs; every other registered query re-applies RUNTIME_CONF
    # through the registry's tune() wrapper, so nothing leaks.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    o = spark.table(t_orders)
    c = spark.table(t_cust)
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            cents_sum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("c_mktsegment")
    )
