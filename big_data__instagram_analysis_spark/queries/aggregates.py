"""Aggregation queries beyond the core set (SURVEY.md §2.4: A2, A4, A6-A10,
plus CUBE/GROUPING SETS variants of A5)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..numeric import cents_sum
from ..registry import query


@query(
    "global_totals",
    category="A2",
    oracle="""
SELECT count(*)                              AS n_rows,
       round(sum(l_quantity), 2)             AS total_qty,
       sum(CAST(floor((l_extendedprice) * 100 + 0.5) AS BIGINT)) / 100.0 AS total_price,
       round(min(l_discount), 4)             AS min_disc,
       round(max(l_discount), 4)             AS max_disc,
       strftime(min(l_shipdate), '%Y-%m-%d') AS first_ship,
       strftime(max(l_shipdate), '%Y-%m-%d') AS last_ship
FROM lineitem
""",
)
def global_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless global aggregate (single-row result, map-side partials)."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        cents_sum(F.col("l_extendedprice")).alias("total_price"),
        F.round(F.min("l_discount"), 4).alias("min_disc"),
        F.round(F.max("l_discount"), 4).alias("max_disc"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("first_ship"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("last_ship"),
    )


@query(
    "approx_count_distinct",
    category="A4",
    oracle="""
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS within_3rsd
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct users per event type — the 100 TB path for
    count-distinct.

    The sketch estimate itself is engine-specific (register layouts and bias
    tables differ), so the raw number can never hash-match DuckDB. What IS
    cross-engine checkable is the accuracy CONTRACT: HLL++ registers merge
    by max, making the estimate a deterministic function of the data (not of
    partitioning or order), so |approx−exact| ≤ 3·rsd·exact is a stable
    boolean. The query emits the exact count (the correctness-tier yardstick;
    at 100 TB you would drop it and keep only the sketch) plus the certified
    tolerance flag the oracle pins to TRUE — the ε-accuracy property test
    promoted into the driver-visible hash check."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.count_distinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.06 * F.col("exact_users")
            ).alias("within_3rsd"),
        )
        .orderBy("event_type")
    )


@query(
    "conditional_agg",
    category="A6",
    oracle="""
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
       sum(CAST(floor((CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END) * 100 + 0.5) AS BIGINT)) / 100.0 AS finished_value,
       CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_open
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/conditional aggregation: sum(CASE WHEN …), count_if."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("o_totalprice") > 150000, 1).otherwise(0))
            .cast("long")
            .alias("n_big"),
            cents_sum(
                F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(0.0)
            ).alias("finished_value"),
            F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "percentiles",
    category="A7",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.25), 4) AS p25,
       round(quantile_cont(l_quantity, 0.50), 4) AS p50,
       round(quantile_cont(l_quantity, 0.75), 4) AS p75,
       round(median(l_extendedprice), 4)         AS median_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    quantile_cont; both linear interpolation). approx_percentile is the
    100 TB path but isn't cross-engine-checkable, so the declared query uses
    the exact form."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("p25"),
            F.round(F.expr("percentile(l_quantity, 0.50)"), 4).alias("p50"),
            F.round(F.expr("percentile(l_quantity, 0.75)"), 4).alias("p75"),
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("median_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "stats_aggs",
    category="A8",
    oracle="""
SELECT l_linestatus,
       round(stddev_samp(l_quantity), 4)               AS sd_qty,
       (CAST(sum(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS HUGEINT)
                 * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
        - CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
          * CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
          / CAST(count(l_extendedprice) AS DOUBLE))
       / (CAST(count(l_extendedprice) AS DOUBLE) - 1) / 10000.0 AS var_price,
       round(corr(l_quantity, l_extendedprice), 6)     AS corr_qty_price,
       round(covar_samp(l_quantity, l_discount), 6)    AS covar_qty_disc
FROM lineitem
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
)
def stats_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/corr/covar.

    var_price is computed from EXACT integer moments over cents-quantized
    prices ((S2 - S1^2/n)/(n-1), converted to double only at the end with
    a textually identical formula in the oracle) — native var_samp over
    doubles at ~9e8 magnitude flips its rounded last digits with partial
    aggregation order (the round-4 sum-determinism audit, PERF.md SS35;
    S2 needs 128-bit accumulation: decimal(38,0) here, HUGEINT in DuckDB).
    """
    li = load(spark, sf_dir, "lineitem")
    _pc = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            (
                (
                    F.sum(
                        (_pc.cast("decimal(19,0)") * _pc.cast("decimal(19,0)")).cast(
                            "decimal(38,0)"
                        )
                    ).cast("double")
                    - F.sum(_pc).cast("double")
                    * F.sum(_pc).cast("double")
                    / F.count("l_extendedprice").cast("double")
                )
                / (F.count("l_extendedprice").cast("double") - 1)
                / 10000.0
            ).alias("var_price"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("covar_qty_disc"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "collect_set_sorted",
    category="A9",
    oracle="""
SELECT o_orderpriority,
       array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
       CAST(count(DISTINCT o_orderstatus) AS BIGINT)                 AS n_statuses
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def collect_set_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set with deterministic emission: sort_array + string join
    (set order is engine-dependent, so the output is canonicalized)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("o_orderstatus"))).alias(
                "statuses"
            ),
            F.countDistinct("o_orderstatus").alias("n_statuses"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "having_filter",
    category="A10",
    oracle="""
SELECT o_custkey, count(*) AS n_orders,
       sum(CAST(floor((o_totalprice) * 100 + 0.5) AS BIGINT)) / 100.0 AS total_spend
FROM orders
GROUP BY o_custkey
HAVING count(*) >= 15
ORDER BY o_custkey
""",
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING ≡ .agg().where())."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            cents_sum(F.col("o_totalprice")).alias("total_spend"),
        )
        .where(F.col("n_orders") >= 15)
        .orderBy("o_custkey")
    )


@query(
    "cube_counts",
    category="A5",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INTEGER) AS gid,
       count(*) AS n
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
ORDER BY gid, o_orderstatus, o_orderpriority
""",
)
def cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE lattice over two dimensions: all 4 grouping-set levels in
    ONE pass — Spark expands the lattice before the partial aggregate, so
    the fact table is scanned once however many levels the cube has."""
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.grouping_id().cast("int").alias("gid"), F.count(F.lit(1)).alias("n"))
        .select("o_orderstatus", "o_orderpriority", "gid", "n")
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    )


@query(
    "grouping_sets",
    category="A5",
    oracle="""
SELECT l_returnflag, l_linestatus,
       sum(CAST(floor((l_extendedprice) * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue,
       count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
ORDER BY l_returnflag, l_linestatus
""",
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (via SQL — DataFrame API exposes only
    rollup/cube; the SQL entry point is part of the declared surface)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               sum(CAST(floor((l_extendedprice) * 100 + 0.5) AS BIGINT)) / CAST(100.0 AS DOUBLE) AS revenue,
               count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        ORDER BY l_returnflag, l_linestatus
        """
    )


@query(
    "stat_crosstab_priority_status",
    category="A6,E23",
    oracle="""
SELECT o_orderpriority AS o_orderpriority_o_orderstatus,
       CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS F,
       CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS O,
       CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS P
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority_o_orderstatus
""",
)
def stat_crosstab_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrameStatFunctions contingency table: priority × status counts.

    df.stat.crosstab plans as a pivot-count (conditional aggregation over
    the observed column domain) — same two-phase agg as E1, surfaced through
    the stat API. Fine when the pivoted domain is small and known (3
    statuses); a high-cardinality crosstab belongs in long form (A1).
    """
    o = load(spark, sf_dir, "orders")
    ct = o.stat.crosstab("o_orderpriority", "o_orderstatus")
    return ct.select(
        "o_orderpriority_o_orderstatus",
        F.col("F").cast("long").alias("F"),
        F.col("O").cast("long").alias("O"),
        F.col("P").cast("long").alias("P"),
    ).orderBy("o_orderpriority_o_orderstatus")
