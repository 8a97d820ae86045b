"""UDF / UDAF / UDTF surface (SURVEY.md §2.11: U1-U6).

Every query here deliberately crosses the executor-JVM ↔ Python-worker
boundary (SURVEY.md §3 boundary #3) and is oracle-checked against a pure-SQL
equivalent — the point is to prove the Arrow/pickle plumbing gives the same
answers as Catalyst expressions, not to use UDFs where built-ins exist.

Performance notes baked into each docstring: row-at-a-time Python UDFs (U1)
are the slow path and appear exactly once; everything else is Arrow-batched
(pandas UDF / applyInPandas / UDTF) so a 100 TB scan amortizes serialization
over whole record batches.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import IntegerType
from pyspark.sql.window import Window

from ..io import load
from ..numeric import cents_sum
from ..registry import query

# --- U1: row-at-a-time Python scalar UDF ------------------------------------


@query(
    "udf_priority_rank",
    category="U1",
    oracle="""
SELECT CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_rank,
       count(*) AS n_orders
FROM orders
GROUP BY prio_rank
ORDER BY prio_rank
""",
)
def udf_priority_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python scalar UDF parsing '3-MEDIUM' → 3, then grouped count.

    Row-at-a-time UDF: pickled per row, no codegen, no pushdown through it —
    kept to demonstrate U1 only. The identical logic exists as a substring
    CAST (the oracle); at 100 TB you would always write the built-in form.
    """
    parse = F.udf(lambda s: int(s.split("-", 1)[0]) if s else None, IntegerType())
    o = load(spark, sf_dir, "orders")
    return (
        o.select(parse("o_orderpriority").alias("prio_rank"))
        .groupBy("prio_rank")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("prio_rank")
    )


# --- U2: pandas scalar UDF (Arrow-vectorized) --------------------------------


@query(
    "pandas_udf_net_price",
    category="U2",
    oracle="""
SELECT l_returnflag,
       sum(CAST(floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100 + 0.5) AS BIGINT)) / 100.0 AS net_revenue
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def pandas_udf_net_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched Series→Series UDF computing the net line price.

    The three input columns arrive as one Arrow record batch per ~10k rows;
    the numpy multiply is vectorized, so the Python boundary costs O(batches)
    not O(rows) — the pattern from SNIPPETS.md's pandas-UDF examples.
    """

    @pandas_udf("double")
    def net(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1.0 - disc) * (1.0 + tax)

    li = load(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_returnflag",
            net("l_extendedprice", "l_discount", "l_tax").alias("net_price"),
        )
        .groupBy("l_returnflag")
        .agg(cents_sum(F.col("net_price")).alias("net_revenue"))
        .orderBy("l_returnflag")
    )


# --- U3: pandas grouped-agg UDAF ---------------------------------------------


@query(
    "pandas_udaf_trimmed_mean",
    category="U3",
    oracle="""
WITH r AS (
  SELECT o_orderpriority, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
)
SELECT o_orderpriority,
       round(avg(o_totalprice), 4) AS trimmed_mean
FROM r
WHERE rn > floor(n * 0.1) AND rn <= n - floor(n * 0.1)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def pandas_udaf_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate (10%-trimmed mean) as a grouped-agg pandas UDF.

    Series→scalar per group; Spark shuffles whole groups to the Python
    worker, so unlike built-in aggs there is no map-side partial — at scale
    prefer an algebraic rewrite (the oracle's window form) when one exists.
    """

    @pandas_udf("double")
    def trimmed_mean(v: pd.Series) -> float:
        s = v.sort_values().to_numpy()
        k = int(len(s) * 0.1)
        return float(s[k : len(s) - k].mean())

    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(F.round(trimmed_mean("o_totalprice"), 4).alias("trimmed_mean"))
        .orderBy("o_orderpriority")
    )


# --- U4: grouped-map applyInPandas -------------------------------------------


@query(
    "grouped_map_zscore",
    category="U4",
    oracle="""
WITH s AS (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         avg(o_totalprice)         OVER (PARTITION BY o_orderpriority) AS mu,
         stddev_samp(o_totalprice) OVER (PARTITION BY o_orderpriority) AS sd,
         count(*)                  OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
)
SELECT o_orderpriority, o_orderkey,
       round((o_totalprice - mu) / sd, 4) + 0.0 AS z
FROM s
WHERE n >= 2 AND sd > 0
ORDER BY o_orderpriority, o_orderkey
""",
)
def grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority-class z-score normalization via applyInPandas (DF→DF).

    The canonical grouped-map shape for feature normalization: one shuffle
    on the group key, then each group is a single pandas frame. Grouping is
    deliberately on the LOW-cardinality key (5 priority classes): grouped-map
    pays per-group Arrow/pandas setup, so it wants few large groups — the
    per-customer variant (15k groups × ~10 rows) measured 45 s at sf0.1 doing
    the same math; this shape does it in ~1 s. For high-cardinality keys the
    window-expression rewrite (this query's oracle) is the right tool.
    Groups of size 1 / zero variance are dropped on both sides.
    """

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pdf.iloc[0:0][["o_orderpriority", "o_orderkey"]].assign(z=0.0)
        sd = pdf["o_totalprice"].std(ddof=1)
        if not sd > 0:
            return pdf.iloc[0:0][["o_orderpriority", "o_orderkey"]].assign(z=0.0)
        z = (pdf["o_totalprice"] - pdf["o_totalprice"].mean()) / sd
        return pd.DataFrame(
            {
                "o_orderpriority": pdf["o_orderpriority"],
                "o_orderkey": pdf["o_orderkey"],
                "z": z,
            }
        )

    o = load(spark, sf_dir, "orders")
    # `+ 0.0` after the round: a value whose z is ±tiny (price == group mean)
    # rounds to SIGNED zero, and -0.0 vs 0.0 string-formats differently per
    # engine — IEEE -0.0 + 0.0 = +0.0 normalizes both sides (the sf0.1 sweep
    # caught this; the sign depends on float accumulation order, so it was
    # also run-to-run flaky).
    return (
        o.select("o_orderpriority", "o_orderkey", "o_totalprice")
        .groupBy("o_orderpriority")
        .applyInPandas(zscore, "o_orderpriority string, o_orderkey long, z double")
        .select(
            "o_orderpriority",
            "o_orderkey",
            (F.round("z", 4) + F.lit(0.0)).alias("z"),
        )
        .orderBy("o_orderpriority", "o_orderkey")
    )


# --- U5: Python UDTF (one row → N rows) --------------------------------------


@query(
    "udtf_shingles",
    category="U5",
    oracle="""
WITH words AS (
  SELECT doc_id,
         string_split_regex(lower(trim(text)), '\\s+') AS w
  FROM documents
  WHERE lang = 'en'
), sh AS (
  SELECT doc_id,
         list_transform(range(1, len(w) - 1),
                        i -> concat_ws(' ', w[i], w[i+1], w[i+2])) AS shingles
  FROM words
  WHERE len(w) >= 3
)
SELECT shingle, count(*) AS n
FROM sh, unnest(shingles) AS t(shingle)
GROUP BY shingle
ORDER BY n DESC, shingle
LIMIT 20
""",
)
def udtf_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF exploding each English doc into 3-word shingles, top-20.

    The UDTF is the shingle generator from the MinHash dedup pipeline
    (operators/dedup.py) exposed as a table function: one input row yields
    n_words-2 output rows via a lateral join. Arrow-batched in Spark 4.
    """

    @udtf(returnType="shingle: string")
    class ShingleGen:
        def eval(self, text: str):
            words = (text or "").lower().strip().split()
            for i in range(len(words) - 2):
                yield (" ".join(words[i : i + 3]),)

    spark.udtf.register("shingle_gen", ShingleGen)
    load(spark, sf_dir, "documents").where(F.col("lang") == "en").createOrReplaceTempView(
        "docs_en_udtf"
    )
    return spark.sql(
        """
        SELECT s.shingle, count(*) AS n
        FROM docs_en_udtf d, LATERAL shingle_gen(d.text) s
        GROUP BY s.shingle
        ORDER BY n DESC, s.shingle
        LIMIT 20
        """
    )


# --- U6: pandas UDF over a window frame --------------------------------------


@query(
    "pandas_window_moving_avg",
    category="U6",
    oracle="""
SELECT user_id, event_id,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mavg
FROM events
WHERE user_id < 3
ORDER BY user_id, event_id
LIMIT 500
""",
)
def pandas_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDAF evaluated over a bounded window frame (3-row moving mean).

    Spark ships each frame slice to the Python worker as an Arrow batch —
    one Python round-trip PER ROW's frame, which is why the input is
    pre-filtered to a user subset: the pattern demonstrates U6, while the
    full-table form of this computation belongs to the built-in window
    (W5) that stays in codegen. Ordered by event_id (not ts) to dodge the
    ns-vs-µs timestamp tie hazard from SURVEY.md §5.4.
    """

    @pandas_udf("double")
    def frame_mean(v: pd.Series) -> float:
        return float(v.mean())

    e = load(spark, sf_dir, "events").where(F.col("user_id") < 3)
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-2, 0)
    return (
        e.select(
            "user_id",
            "event_id",
            F.round(frame_mean("value").over(w), 4).alias("mavg"),
        )
        .orderBy("user_id", "event_id")
        .limit(500)
    )


# --- E183: UDTF with TABLE argument + PARTITION BY/ORDER BY -------------------


@query(
    "udtf_table_arg_gap_stats",
    category="U5,E183",
    oracle="""
WITH e AS (
  SELECT user_id, epoch_ns(ts) AS ns
  FROM events WHERE user_id < 30
), g AS (
  SELECT user_id, ns,
         ns - lag(ns) OVER (PARTITION BY user_id ORDER BY ns) AS gap
  FROM e
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n,
       CAST(max(gap) AS BIGINT) AS max_gap_ns,
       CAST(max(ns) - min(ns) AS BIGINT) AS span_ns
FROM g
GROUP BY user_id
ORDER BY user_id
""",
)
def udtf_table_arg_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF taking a TABLE argument with PARTITION BY ... ORDER BY —
    the Spark-3.5+ table-function API where the ENGINE groups and sorts the
    input and hands each partition to one UDTF instance in order
    (eval per row, terminate emits the partition summary). This is the
    sanctioned home for per-key sequential logic that a window can't
    express (state machines, custom session logic): the shuffle and sort
    stay in the engine, only the per-partition fold runs in Python.

    The fold here (count, max consecutive gap, span over ns-ordered
    events) is deliberately window-expressible so the DuckDB lag/group
    twin can hash-check the MACHINERY — partition isolation, in-partition
    order, one terminate per key. Arrow batches rows in; one row out per
    partition — shuffle volume O(#users).
    """
    from pyspark.sql.types import LongType, StructType

    class GapStats:
        def __init__(self) -> None:
            self.user = None
            self.n = 0
            self.prev = None
            self.max_gap = None
            self.first = None
            self.last = None

        def eval(self, row) -> None:
            self.user = row["user_id"]
            ns = row["ns"]
            self.n += 1
            if self.prev is not None:
                gap = ns - self.prev
                if self.max_gap is None or gap > self.max_gap:
                    self.max_gap = gap
            self.prev = ns
            if self.first is None:
                self.first = ns
            self.last = ns

        def terminate(self):
            if self.user is not None:
                yield (self.user, self.n, self.max_gap, self.last - self.first)

    schema = (
        StructType()
        .add("user_id", LongType())
        .add("n", LongType())
        .add("max_gap_ns", LongType())
        .add("span_ns", LongType())
    )
    gap_udtf = udtf(GapStats, returnType=schema)
    spark.udtf.register("sg_gap_stats", gap_udtf)
    load(spark, sf_dir, "events").where(F.col("user_id") < 30).select(
        "user_id", F.col("ts_ns").alias("ns")
    ).createOrReplaceTempView("events_gap_v")
    return spark.sql(
        """
        SELECT user_id, n, max_gap_ns, span_ns
        FROM sg_gap_stats(TABLE(events_gap_v)
                          PARTITION BY user_id ORDER BY ns)
        ORDER BY user_id
        """
    )
