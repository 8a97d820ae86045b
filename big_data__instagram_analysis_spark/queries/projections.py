"""Projection / filter / predicate queries (SURVEY.md §2.2 P1-P6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import query


@query(
    "project_computed_cols",
    category="P1",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount)               AS net_price,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS gross_price,
       l_quantity
FROM lineitem
""",
)
def project_computed_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level arithmetic projection, emitted UNROUNDED: both engines
    evaluate the identical operand order per row, so the doubles are
    bit-exact — while ROUND itself diverges across engines on exact .5
    boundaries, which fixed-decimal prices hit. Round order-dependent
    aggregates; never round deterministic per-row math (SURVEY.md §5.4)."""
    li = load(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net_price"),
        (net * (1 + F.col("l_tax"))).alias("gross_price"),
        "l_quantity",
    )


@query(
    "filter_boolean_combo",
    category="P2",
    oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
FROM lineitem
WHERE (l_returnflag = 'A' AND l_discount > 0.05)
   OR (NOT (l_linestatus = 'F') AND l_quantity <= 10)
""",
)
def filter_boolean_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT + comparison predicates, pushed into the parquet scan."""
    li = load(spark, sf_dir, "lineitem")
    cond = ((F.col("l_returnflag") == "A") & (F.col("l_discount") > 0.05)) | (
        ~(F.col("l_linestatus") == "F") & (F.col("l_quantity") <= 10)
    )
    return li.where(cond).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"
    )


@query(
    "filter_between_in_like",
    category="P3",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal
FROM customer
WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY')
  AND c_acctbal BETWEEN 0 AND 5000
  AND c_name LIKE '%1%'
""",
)
def filter_between_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN / IN / LIKE predicate forms — all three push into the scan
    (IN becomes an OR-chain the reader evaluates against row groups; LIKE
    with a leading literal prefix prunes via min/max stats)."""
    c = load(spark, sf_dir, "customer")
    return c.where(
        F.col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY")
        & F.col("c_acctbal").between(0, 5000)
        & F.col("c_name").like("%1%")
    ).select("c_custkey", "c_mktsegment", "c_acctbal")


@query(
    "null_semantics",
    category="P4",
    oracle="""
WITH t AS (
  SELECT o_orderpriority, NULLIF(o_orderstatus, 'P') AS status_np
  FROM orders
)
SELECT o_orderpriority,
       CAST(sum(CASE WHEN status_np IS NULL     THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(sum(CASE WHEN status_np IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_not_null,
       CAST(sum(CASE WHEN status_np IS NOT DISTINCT FROM 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_o,
       CAST(sum(CASE WHEN status_np IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_null
FROM t
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """isNull / isNotNull / null-safe equality (<=>) on synthesized NULLs
    (fixtures carry none, so NULLIF creates them)."""
    o = load(spark, sf_dir, "orders")
    status_np = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    t = o.select("o_orderpriority", status_np.alias("status_np"))
    as_long = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return (
        t.groupBy("o_orderpriority")
        .agg(
            as_long(F.col("status_np").isNull()).alias("n_null"),
            as_long(F.col("status_np").isNotNull()).alias("n_not_null"),
            as_long(F.col("status_np").eqNullSafe(F.lit("O"))).alias("n_nullsafe_o"),
            as_long(F.col("status_np").eqNullSafe(F.lit(None).cast("string"))).alias(
                "n_nullsafe_null"
            ),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "distinct_pairs",
    category="P5",
    oracle="""
SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
""",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row dedup over a projected pair (hash-agg distinct)."""
    c = load(spark, sf_dir, "customer")
    return c.select("c_nationkey", "c_mktsegment").distinct()


@query(
    "drop_duplicates_subset",
    category="P5",
    oracle="""
SELECT c_nationkey, CAST(min(c_custkey) AS BIGINT) AS c_custkey
FROM customer
GROUP BY c_nationkey
""",
)
def drop_duplicates_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup (one row per nation). dropDuplicates keeps an arbitrary
    row, so for oracle determinism we keep min(c_custkey) via a rank —
    semantically dropDuplicates with a deterministic survivor policy."""
    from pyspark.sql.window import Window

    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    return (
        c.select("c_nationkey", "c_custkey", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") == 1)
        .select("c_nationkey", "c_custkey")
    )


def _bernoulli_sample_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw seeded Bernoulli sample rows — used by the registered certified
    query below and tests/test_properties.py's CI/determinism checks."""
    li = load(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


_STRATA_FRACTIONS = {
    "view": 0.1,
    "click": 0.1,
    "purchase": 1.0,
    "signup": 0.5,
    "error": 0.02,
}


def _stratified_sample_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw seeded stratified sample rows (sampleBy) — used by the registered
    certified query below and tests/test_sampling.py."""
    e = load(spark, sf_dir, "events")
    return e.sampleBy("event_type", fractions=_STRATA_FRACTIONS, seed=7).select(
        "event_id", "event_type", "user_id"
    )


@query(
    "sample_bernoulli",
    category="P6",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_total,
       TRUE AS within_5sigma,
       TRUE AS unbiased_mean
FROM lineitem
""",
)
def sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample, hash-checked via the certified-property
    pattern: the drawn ROWS are engine-RNG-specific (Spark's XORShift per
    partition — no SQL twin), but the sampler's CONTRACT is portable.
    Emits the exact population size plus two booleans the oracle pins
    TRUE: the sampled count sits inside a 5σ binomial window around
    0.1·n (catches a fraction applied twice or to a pre-filtered scan),
    and the sampled mean quantity sits within 5 standard errors of the
    population mean (catches a value-correlated, biased sampler). Raw
    sample rows stay available via _bernoulli_sample_rows for the
    property tests in tests/test_properties.py."""
    li = load(spark, sf_dir, "lineitem")
    s = _bernoulli_sample_rows(spark, sf_dir)
    frac = 0.1
    samp = s.agg(
        F.count(F.lit(1)).alias("k"),
        F.avg("l_quantity").alias("samp_mean"),
    )
    pop = li.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.avg("l_quantity").alias("pop_mean"),
        F.stddev_pop("l_quantity").alias("pop_sd"),
    )
    return pop.crossJoin(samp).select(
        "n_total",
        (
            F.abs(F.col("k") - frac * F.col("n_total"))
            <= 5 * F.sqrt(F.col("n_total") * frac * (1 - frac)) + 1
        ).alias("within_5sigma"),
        (
            F.abs(F.col("samp_mean") - F.col("pop_mean"))
            <= 5 * F.col("pop_sd") / F.sqrt(F.col("k"))
        ).alias("unbiased_mean"),
    )


@query(
    "sample_stratified_by_type",
    category="P6,E15",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_stratum,
       TRUE AS within_5sigma
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def sample_stratified_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded stratified sample (sampleBy): per-stratum Bernoulli fractions —
    downsample the over-represented event types (the class-rebalancing step
    of a training-data pipeline). One scan, no shuffle: each row flips a coin
    whose bias is looked up from its stratum.

    Hash-checked via the certified-property pattern: drawn rows are
    engine-RNG-specific, but per-stratum the sampled count must sit in a
    5σ binomial window around fraction·n (and be EXACTLY n for the
    fraction-1.0 stratum) — a boolean the oracle pins TRUE next to the
    exact stratum size. Raw rows stay available via
    _stratified_sample_rows for tests/test_sampling.py."""
    e = load(spark, sf_dir, "events")
    s = _stratified_sample_rows(spark, sf_dir)
    frac = F.create_map(
        *[F.lit(x) for kv in _STRATA_FRACTIONS.items() for x in kv]
    )
    pop = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_stratum"))
    samp = s.groupBy("event_type").agg(F.count(F.lit(1)).alias("k"))
    p = frac[F.col("event_type")]
    return (
        pop.join(samp, "event_type", "left")
        .select(
            "event_type",
            "n_stratum",
            (
                F.abs(F.coalesce(F.col("k"), F.lit(0)) - p * F.col("n_stratum"))
                <= 5 * F.sqrt(F.col("n_stratum") * p * (1 - p)) + 1
            ).alias("within_5sigma"),
        )
        .orderBy("event_type")
    )
