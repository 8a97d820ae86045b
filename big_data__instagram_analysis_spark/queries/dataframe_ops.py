"""DataFrame-API reshaping & cleaning ops (§2 P/A-family extensions).

pivot / unpivot(melt) / NA handling are first-class DataFrame operations any
reference user would reach for; none map to a single §2 row, so they get
their own oracle-checked queries here. Also pulls the part/supplier
dimensions into active coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..numeric import cents_avg4, cents_sum
from ..registry import query

# --- pivot -------------------------------------------------------------------


@query(
    "pivot_event_type_counts",
    category="A1,A6,E1",
    oracle="""
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def pivot_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() → wide per-user event-type count matrix.

    The pivot values are DECLARED (not discovered) so the plan is a single
    two-phase conditional aggregation — no extra values-discovery job, and
    the schema is stable however the data shards. At 100 TB an undeclared
    pivot would first run a distinct scan over the pivot column: never do
    that on a fact table.
    """
    e = load(spark, sf_dir, "events")
    out = (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c)
          for c in ("click", "error", "purchase", "signup", "view")],
    ).orderBy("user_id")


# --- unpivot / melt ----------------------------------------------------------


@query(
    "unpivot_part_measures",
    category="P1,F7,E2",
    oracle="""
SELECT p_partkey, measure, round(val, 2) AS val
FROM (
  SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS val FROM part
  UNION ALL
  SELECT p_partkey, 'p_retailprice' AS measure, p_retailprice AS val FROM part
)
ORDER BY p_partkey, measure
""",
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.unpivot (melt): wide part measures → long (key, measure, value).

    Executes as a generate/expand over each row — no shuffle at all until
    the final presentation sort; the long format is what feature pipelines
    feed into grouped normalization (U4).
    """
    p = load(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.col("p_size").cast("double").alias("p_size"),
            F.col("p_retailprice").alias("p_retailprice"),
        )
        .unpivot("p_partkey", ["p_size", "p_retailprice"], "measure", "raw_val")
        .select("p_partkey", "measure", F.round("raw_val", 2).alias("val"))
        .orderBy("p_partkey", "measure")
    )


# --- NA handling -------------------------------------------------------------


@query(
    "na_fill_drop_supplier",
    category="P4,F5,E3",
    oracle="""
WITH flagged AS (
  SELECT s_suppkey, s_nationkey,
         nullif(round(s_acctbal, 2), 0) AS bal
  FROM supplier
)
SELECT s_suppkey, s_nationkey,
       coalesce(bal, -1.0) AS bal_filled
FROM flagged
WHERE s_nationkey IS NOT NULL
ORDER BY s_suppkey
""",
)
def na_fill_drop_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrameNaFunctions surface: na.drop on keys + na.fill on measures.

    NULLs are manufactured with nullif (fixtures are fully dense) so the
    fill/drop paths execute for real. fillna/dropna compile to the same
    coalesce / IsNotNull expressions the oracle states — zero plan overhead.
    """
    s = load(spark, sf_dir, "supplier")
    flagged = s.select(
        "s_suppkey",
        "s_nationkey",
        F.nullif(F.round("s_acctbal", 2), F.lit(0)).alias("bal"),
    )
    return (
        flagged.na.drop(subset=["s_nationkey"])
        .na.fill({"bal": -1.0})
        .select("s_suppkey", "s_nationkey", F.col("bal").alias("bal_filled"))
        .orderBy("s_suppkey")
    )


# --- supplier balance league (dims exercised in a join) ----------------------


@query(
    "supplier_balance_by_nation",
    category="J1,A1",
    oracle="""
SELECT n.n_name,
       count(*) AS n_suppliers,
       sum(CAST(floor(s.s_acctbal * 100 + 0.5) AS BIGINT)) / 100.0 AS total_bal,
       floor(sum(CAST(floor(s.s_acctbal * 100 + 0.5) AS BIGINT)) * 100.0
             / count(s.s_acctbal) + 0.5) / 10000.0 AS avg_bal
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY total_bal DESC, n_name
""",
)
def supplier_balance_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier account-balance league table per nation (broadcast dim join)."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            # Round-11 ×10 audit flag (2.6e5 magnitude): exact cents sum +
            # floor-form 4dp avg, merge-order-immune by construction.
            cents_sum("s_acctbal").alias("total_bal"),
            cents_avg4("s_acctbal").alias("avg_bal"),
        )
        .orderBy(F.desc("total_bal"), "n_name")
    )


@query(
    "union_by_name_mixed",
    category="T1,E41",
    oracle="""
SELECT src, CAST(count(*) AS BIGINT) AS n,
       CAST(count(c_acctbal) AS BIGINT) AS with_bal,
       CAST(count(s_src_name) AS BIGINT) AS with_name
FROM (
  SELECT 'cust' AS src, c_acctbal, NULL AS s_src_name FROM customer
  UNION ALL BY NAME
  SELECT 'supp' AS src, s_name AS s_src_name, s_acctbal AS c_acctbal FROM supplier
)
GROUP BY src ORDER BY src
""",
)
def union_by_name_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True): schema-aligned union of
    heterogenous frames — columns match by NAME, absent ones null-fill.

    The positional union (T1) silently mis-zips reordered schemas; by-name
    union is what schema evolution across ingestion generations actually
    needs (same reason S1's mergeSchema scan exists). DuckDB's
    UNION ALL BY NAME is the exact twin.
    """
    c = load(spark, sf_dir, "customer").select(
        F.lit("cust").alias("src"), "c_acctbal"
    )
    s = load(spark, sf_dir, "supplier").select(
        F.lit("supp").alias("src"),
        F.col("s_name").alias("s_src_name"),
        F.col("s_acctbal").alias("c_acctbal"),
    )
    u = c.unionByName(s, allowMissingColumns=True)
    return (
        u.groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("c_acctbal").alias("with_bal"),
            F.count("s_src_name").alias("with_name"),
        )
        .orderBy("src")
    )


@query(
    "freq_items_segment",
    category="A4,E42",
    oracle="""
WITH counts AS (
  SELECT c_mktsegment AS seg, count(*) AS cnt
  FROM customer GROUP BY c_mktsegment
), tot AS (
  SELECT sum(cnt) AS t FROM counts
), freq AS (
  SELECT seg FROM counts, tot WHERE cnt * 1.0 / t > 0.15
)
SELECT array_to_string(list_sort(list(seg)), ',') AS frequent_csv,
       TRUE AS all_frequent_in_candidates
FROM freq
""",
)
def freq_items_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.stat.freqItems: one-pass heavy-hitter candidates (Karp et al.
    space-saving variant) for the market-segment column, CERTIFIED against
    the exact frequent set.

    freqItems' guarantee is one-sided — every item with frequency > support
    is PRESENT in the candidates, false positives allowed — so the raw
    candidate set is implementation-defined and not hash-checkable. The
    certified form (same pattern as approx_count_distinct): compute the
    EXACT frequent set with a groupBy (exactly what freqItems avoids at
    scale — fine to pay in a checked query), emit it sorted as a csv
    string, plus ``all_frequent_in_candidates`` — the one-sided guarantee
    evaluated in-plan via an ``exists`` over the exact set against the
    candidate array — which the oracle pins TRUE. A hash match certifies
    both the exact frequent membership and the sketch's guarantee.
    tests/test_scale_ops.py asserts the same guarantee property. The scale
    case for freqItems itself: finding hot keys (for E5's salted join)
    without a full groupBy.
    """
    c = load(spark, sf_dir, "customer")
    freq = c.stat.freqItems(["c_mktsegment"], support=0.15)
    counts = c.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = counts.agg(F.sum("cnt").alias("t"))
    frequent = (
        counts.crossJoin(F.broadcast(tot))
        .where(F.col("cnt") > 0.15 * F.col("t"))
        .agg(F.sort_array(F.collect_list("seg")).alias("frequent"))
    )
    return frequent.crossJoin(F.broadcast(freq)).select(
        F.concat_ws(",", "frequent").alias("frequent_csv"),
        F.forall(
            "frequent",
            lambda s: F.array_contains(F.col("c_mktsegment_freqItems"), s),
        ).alias("all_frequent_in_candidates"),
    )


@query(
    "nested_array_of_structs",
    category="F7,A9,E68",
    oracle="""
WITH per_cust AS (
  SELECT o_custkey,
         array_to_string(
           list_transform(
             list_slice(
               list_reverse(list_sort(
                 list((round(o_totalprice, 2), o_orderkey)))),
               1, 3),
             s -> s[2]),
           ',') AS top3,
         CAST(count(*) AS BIGINT) AS n_orders,
         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0 AS total
  FROM orders
  GROUP BY o_custkey
)
SELECT o_custkey, top3, n_orders, total
FROM per_cust
ORDER BY o_custkey
""",
)
def nested_array_of_structs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-data pipeline: collect each customer's orders into an
    array of structs, then do the 'top-3 by price' ENTIRELY inside the
    array (sort → reverse → slice → field-extract) — document-shaped
    output without a second window pass.

    collect_list's order is nondeterministic by contract, which is why
    the sort happens inside the array AFTER collection — the recurring
    bug this query pins is trusting collect order. One groupBy shuffle
    total; per-group array size is the scale guard (bounded fan-out per
    customer here; unbounded keys need W2's windowed top-k instead).

    The final emit serializes the array to a comma-joined string so the
    driver's order-insensitive value hash (pandas-based) can handle the
    column — raw array columns are unhashable in its comparator.
    """
    o = load(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.collect_list(
            F.struct(F.round("o_totalprice", 2).alias("p"), F.col("o_orderkey").alias("k"))
        ).alias("orders_arr"),
        F.count(F.lit(1)).alias("n_orders"),
        cents_sum(F.col("o_totalprice")).alias("total"),
    )
    top3 = F.array_join(
        F.transform(
            F.slice(F.reverse(F.array_sort("orders_arr")), 1, 3),
            lambda s: s["k"].cast("string"),
        ),
        ",",
    )
    return per.select(
        "o_custkey", top3.alias("top3"), "n_orders", "total"
    ).orderBy("o_custkey")
