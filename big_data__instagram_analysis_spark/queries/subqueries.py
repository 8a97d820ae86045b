"""Subquery family (SURVEY.md §2.12 E16): scalar, correlated-scalar, IN, and
NOT EXISTS subqueries through the SQL frontend.

These run via ``spark.sql`` over the registered fixture views on purpose —
the declared surface includes the SQL entry point (SURVEY.md §3 entry
point 3), and subqueries are where that frontend does real work: Catalyst
rewrites every shape below into a join (scalar → cross/left join of a
1-row aggregate, correlated scalar → left outer join on the correlation
key, IN → left semi, NOT EXISTS → left anti), so what executes is the same
shuffle/broadcast machinery as the DataFrame queries — decorrelation is an
optimizer rewrite, not an execution feature. The oracle strings are the
same ANSI text, which is the point: this family is checked frontend-to-
frontend.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load, register_views
from ..registry import query

_SCALAR = """
SELECT c_custkey, round(c_acctbal, 2) AS bal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
ORDER BY c_custkey
"""

_CORRELATED = """
SELECT p.p_partkey, p.p_brand, round(p.p_retailprice, 2) AS price
FROM part p
WHERE p.p_retailprice > (SELECT avg(p2.p_retailprice) * 1.01
                         FROM part p2
                         WHERE p2.p_brand = p.p_brand)
ORDER BY p.p_partkey
"""

_IN = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_nationkey IN (SELECT c_nationkey FROM customer WHERE c_acctbal < 0)
ORDER BY s_suppkey
"""

_NOT_EXISTS = """
SELECT c.c_custkey
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000)
ORDER BY c.c_custkey
"""


def _sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(text)


@query("scalar_subquery_above_avg", category="E16", oracle=_SCALAR)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: customers above the global mean balance.
    Catalyst plans the 1-row aggregate as a broadcast to the filter."""
    return _sql(spark, sf_dir, _SCALAR)


@query("correlated_scalar_brand_premium", category="E16", oracle=_CORRELATED)
def correlated_scalar_brand_premium(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: parts priced >1% above their brand's mean
    (fixture prices span 900-1000; the original 2% threshold exceeded every
    part at sf0.001 — caught by tests/test_nonempty_oracles.py — while 1%
    keeps 8 rows at sf0.001 and 800 at sf0.01).
    Decorrelated into (part ⟕ per-brand aggregate) on p_brand."""
    return _sql(spark, sf_dir, _CORRELATED)


@query("in_subquery_nations", category="E16", oracle=_IN)
def in_subquery_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery: suppliers in any nation with an overdrawn customer.
    Rewritten to a left-semi join on the nation key."""
    return _sql(spark, sf_dir, _IN)


@query("not_exists_big_order", category="E16", oracle=_NOT_EXISTS)
def not_exists_big_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS: customers with no order over 300k.
    Rewritten to a left-anti join with the pushed-down order filter."""
    return _sql(spark, sf_dir, _NOT_EXISTS)


_GROUP_BY_ALL = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(l_quantity), 2) AS qty
FROM lineitem
GROUP BY ALL
ORDER BY l_returnflag, l_linestatus
"""


@query("group_by_all", category="A1,E49", oracle=_GROUP_BY_ALL)
def group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL: every non-aggregate select item becomes a grouping
    key — the modern-SQL ergonomic both engines support VERBATIM, so this
    is a frontend-to-frontend check with one shared query text. Catalyst
    resolves it to the same two-phase hash aggregate as the explicit form.
    """
    register_views(spark, sf_dir)
    return spark.sql(_GROUP_BY_ALL)


@query(
    "sql_pivot_clause",
    category="A6,E50",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS f_n,
       coalesce(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                FILTER (o_orderstatus = 'F'), 0) / 100.0 AS f_total,
       CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS o_n,
       coalesce(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                FILTER (o_orderstatus = 'O'), 0) / 100.0 AS o_total,
       CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS p_n,
       coalesce(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                FILTER (o_orderstatus = 'P'), 0) / 100.0 AS p_total
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def sql_pivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL PIVOT clause (TRANSFORM ... FOR ... IN with declared
    values): long→wide through the SQL frontend rather than the
    DataFrame .pivot() API (E1). Declared pivot values keep the plan
    single-pass — no distinct-scan to discover columns — which is the
    only pivot shape that works when the pivoted table is the 100 TB
    side. The oracle is the equivalent FILTERed aggregation; Spark's
    PIVOT compiles to exactly that.
    """
    register_views(spark, sf_dir)
    df = spark.sql(
        """
        SELECT * FROM (
          SELECT o_orderpriority, o_orderstatus, o_totalprice FROM orders
        )
        PIVOT (
          count(*) AS n,
          coalesce(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)), 0)
            / CAST(100.0 AS DOUBLE) AS total
          FOR o_orderstatus IN ('F' AS f, 'O' AS o, 'P' AS p)
        )
        ORDER BY o_orderpriority
        """
    )
    from pyspark.sql import functions as F

    return df.select(
        "o_orderpriority",
        F.col("f_n").cast("bigint").alias("f_n"),
        F.col("f_total").alias("f_total"),
        F.col("o_n").cast("bigint").alias("o_n"),
        F.col("o_total").alias("o_total"),
        F.col("p_n").cast("bigint").alias("p_n"),
        F.col("p_total").alias("p_total"),
    )


_RECURSIVE = """
WITH RECURSIVE anc AS (
  SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth
  FROM customer WHERE c_custkey >= 1 AND c_custkey < 200
  UNION ALL
  SELECT node, CAST(floor(cur / 2) AS BIGINT) AS cur, depth + 1 AS depth
  FROM anc WHERE cur > 1
)
SELECT node, CAST(max(depth) AS BIGINT) AS depth_to_root,
       CAST(count(*) AS BIGINT) AS chain_len
FROM anc
GROUP BY node
ORDER BY node
"""


@query("recursive_cte_hierarchy", category="E64", oracle=_RECURSIVE)
def recursive_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (new in Spark 4): walk a synthetic binary hierarchy
    (parent = floor(id/2)) to the root, measuring depth and chain length
    per node — the org-chart / category-tree traversal SQL previously
    needed iterative DataFrame loops (E12-style) to express.

    Same query text runs verbatim on both engines — frontend-to-frontend
    parity like E16/E49. Spark executes the recursion as iterated
    UnionLoop steps; depth is bounded by log2(domain), so each step is a
    small self-contained batch. For UNBOUNDED or huge closures the
    operators/graph.py forms (CC's star contractions) remain the scale
    path — recursion depth on a cluster is plan depth, and log-round
    algorithms beat per-level walks there.
    """
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE)


# --- E184 (extension): modern SQL surface — FILTER, lateral alias, * EXCEPT --

_MODERN = """
WITH base AS (
  SELECT * EXCLUDE (o_orderkey, o_custkey, o_orderdate)
  FROM orders
)
SELECT o_orderpriority AS prio,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT) AS n_big,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_final,
       CAST(floor(n_big * 1000000.0 / n + 0.5) AS BIGINT) AS big_share_ppm
FROM base
GROUP BY o_orderpriority
ORDER BY prio
"""

_MODERN_SPARK = """
WITH base AS (
  SELECT * EXCEPT (o_orderkey, o_custkey, o_orderdate)
  FROM orders
)
SELECT o_orderpriority AS prio,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT) AS n_big,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_final,
       CAST(floor(n_big * 1000000.0 / n + 0.5) AS BIGINT) AS big_share_ppm
FROM base
GROUP BY o_orderpriority
ORDER BY prio
"""


@query("sql_modern_surface", category="E184,F5,A6", oracle=_MODERN)
def sql_modern_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three modern SQL-frontend features in one hash-checked query:
    ``* EXCEPT (cols)`` star projection (DuckDB spells it EXCLUDE),
    aggregate ``FILTER (WHERE ...)`` clauses (the standard form of
    conditional aggregation — Catalyst compiles them to the same
    count(CASE WHEN) plan as A6), and LATERAL COLUMN ALIASES: big_share_ppm
    references the n_big and n aliases defined earlier in the same SELECT
    list, which the analyzer resolves by inlining (no self-join, no CTE
    duplication — plan-identical to writing the aggregates twice).

    All three are analysis-time rewrites with zero runtime cost at any
    scale; the hash check proves both engines' sugar desugars to the same
    arithmetic (share emitted as floor-ppm integer per §5.4).
    """
    register_views(spark, sf_dir)
    return spark.sql(_MODERN_SPARK)


# --- E203 (extension): SQL UNPIVOT clause -------------------------------------

_UNPIVOT_SQL = """
SELECT p_partkey, measure, round(val, 2) AS val
FROM (SELECT p_partkey, round(p_retailprice, 2) AS retailprice,
             CAST(p_size AS DOUBLE) AS size_val
      FROM part WHERE p_partkey < 300)
UNPIVOT (val FOR measure IN (retailprice, size_val))
ORDER BY p_partkey, measure
"""


@query("sql_unpivot_clause", category="P1,E203", oracle=_UNPIVOT_SQL)
def sql_unpivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL UNPIVOT clause (wide → long through the frontend), the
    standard-syntax twin of df.unpivot/melt (unpivot_part_measures): both
    engines parse the identical text, and both compile to the same
    generate/expand over each row — zero shuffle before the presentation
    sort. Measures are pre-cast to one type (UNPIVOT requires a common
    value type) and pre-rounded so the long rows hash exactly.
    """
    register_views(spark, sf_dir)
    return spark.sql(_UNPIVOT_SQL)


# ---------------------------------------------------------------------------
# E265: recursive CTE — repeat-purchase chain walk (Spark 4's SQL frontier)
# ---------------------------------------------------------------------------

#: hop bound for the recursive walk (constant — bounds iterations at any SF)
CHAIN_MAX_HOP = 5

#: The IDENTICAL text runs on both engines: Spark 4.1 and DuckDB both
#: support WITH RECURSIVE ... UNION ALL (Spark does not yet support the
#: UNION-dedup form — [UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE]); DATEDIFF's
#: day count is exact-integer on both. The only engine-split token is the
#: integer-division spelling, injected below.
_CHAIN_SQL = """
WITH RECURSIVE walk(c, k, hop, cum_gap) AS (
  SELECT o_custkey, o_orderkey, 0, CAST(0 AS BIGINT)
  FROM (SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders) WHERE rn = 1
  UNION ALL
  SELECT e.o_custkey, e.nk, w.hop + 1, w.cum_gap + e.gap_days
  FROM walk w
  JOIN (SELECT o_custkey, o_orderkey,
               LEAD(o_orderkey) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS nk,
               CAST(DATEDIFF({dd}) AS BIGINT) AS gap_days
        FROM orders) e
    ON w.c = e.o_custkey AND w.k = e.o_orderkey
  WHERE e.nk IS NOT NULL AND w.hop < {max_hop}
)
SELECT CAST(hop AS BIGINT) AS hop,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(cum_gap) AS BIGINT) AS total_wait_days,
       CAST(sum(cum_gap) * 1000000 {div} count(*) AS BIGINT)
         AS avg_wait_days_ppm
FROM walk GROUP BY hop ORDER BY hop
"""

_LEAD_DATE = (
    "LEAD(o_orderdate) OVER (PARTITION BY o_custkey "
    "ORDER BY o_orderdate, o_orderkey)"
)

#: Engine-side twin of _CHAIN_SQL over a PRE-MATERIALIZED edge view
#: (r12, guide §2.4): Spark's UnionLoop re-evaluates the recursive arm's
#: subqueries EVERY iteration, so the original text recomputed the
#: orders scan + LEAD window up to 5 times (measured 44 jobs / 145
#: stages at sf0.1). The edge relation (rn for the anchor, nk/gap_days
#: for the walk) is one window pass, localCheckpoint'd and registered as
#: a temp view; the recursion — still a real WITH RECURSIVE — then joins
#: the shrinking frontier against the materialized RDD each hop. The
#: oracle keeps the original self-contained text; results are identical
#: (same rn/nk/gap definitions, same hop bound).
_CHAIN_SQL_ENGINE = """
WITH RECURSIVE walk(c, k, hop, cum_gap) AS (
  SELECT o_custkey, o_orderkey, 0, CAST(0 AS BIGINT)
  FROM {view} WHERE rn = 1
  UNION ALL
  SELECT e.o_custkey, e.nk, w.hop + 1, w.cum_gap + e.gap_days
  FROM walk w
  JOIN {view} e
    ON w.c = e.o_custkey AND w.k = e.o_orderkey
  WHERE e.nk IS NOT NULL AND w.hop < {max_hop}
)
SELECT CAST(hop AS BIGINT) AS hop,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(cum_gap) AS BIGINT) AS total_wait_days,
       CAST(sum(cum_gap) * 1000000 div count(*) AS BIGINT)
         AS avg_wait_days_ppm
FROM walk GROUP BY hop ORDER BY hop
"""


@query(
    "repeat_purchase_chains",
    category="J10,W3,E265",
    oracle=_CHAIN_SQL.format(
        dd=f"'day', o_orderdate, {_LEAD_DATE}", div="//", max_hop=CHAIN_MAX_HOP
    ),
)
def repeat_purchase_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE — the SQL-frontier
    iteration primitive) walking each customer's repeat-purchase chain:
    from the first order, follow the next-order edge up to 5 hops, and
    report how many customers reach each depth plus the exact cumulative
    wait (days since first purchase, summed along the walked path). The
    retention-depth curve a growth team reads off the order history.

    Why this recursion cannot blow up: the edge relation is the LEAD of a
    per-customer window, so every node has OUT-DEGREE <= 1 — the walk is
    a set of disjoint linear chains, and UNION ALL path multiplicity
    (which Spark's recursive CTEs cannot dedup yet —
    UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE) is structurally 1. Each
    iteration is one equi-join of a shrinking frontier (<= |customers|
    rows) against the edge table, the same shape as the repo's large-star
    CC rounds (operators/graph.py) — and the hop bound caps iterations at
    a constant regardless of corpus size. Gaps are exact integer day
    counts, the ppm average is integer division.

    r12: the engine side now runs the recursion over a pre-materialized
    edge view (see _CHAIN_SQL_ENGINE) — one orders scan + ONE window pass
    computing rn/nk/gap_days, instead of UnionLoop re-running the scan +
    LEAD window in every iteration (44 jobs / 145 stages → the edge
    window once; sf0.1 numbers in OPTIMIZATION_r12.md). The oracle keeps
    the original self-contained recursive text, so the hash match proves
    the rewrite computes the identical walk.
    """
    from pyspark.sql.window import Window as _W

    o = load(spark, sf_dir, "orders")
    w = _W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    edges = o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.lead("o_orderkey").over(w).alias("nk"),
        F.datediff(F.lead("o_orderdate").over(w), F.col("o_orderdate"))
        .cast("bigint")
        .alias("gap_days"),
    ).localCheckpoint(eager=False)
    # ADVICE r12: bind the DataFrame as a spark.sql parameter instead of
    # registering a fixed-name temp view — two interleaved invocations in
    # one session (e.g. different sf_dir) can no longer race between the
    # catalog mutation and analysis, because no catalog mutation happens.
    sql = _CHAIN_SQL_ENGINE.format(view="{edges}", max_hop=CHAIN_MAX_HOP)
    return spark.sql(sql, edges=edges)
