"""Scalar function families (SURVEY.md §2.8 F1-F8; F3/F9 core forms are in
core.py). Each query exercises one family end-to-end with hash-checked
output. Dialect notes are inline where Spark and DuckDB differ."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import query


@query(
    "string_funcs",
    category="F1",
    oracle="""
SELECT c_custkey,
       lower(c_name)                         AS name_lower,
       upper(c_mktsegment)                   AS seg_upper,
       CAST(length(c_name) AS INTEGER)       AS name_len,
       substring(c_name, 1, 8)               AS name_prefix,
       concat_ws('|', c_mktsegment, c_name)  AS seg_name,
       trim(concat('  ', c_name, ' '))       AS name_trim,
       replace(c_name, 'Customer', 'User')   AS name_repl
FROM customer
""",
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower/upper/length/substring/concat_ws/trim/replace."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.length("c_name").cast("int").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("name_trim"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("User")).alias("name_repl"),
    )


@query(
    "regex_funcs",
    category="F2",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_brand, '([0-9]+)', 1)              AS brand_num,
       regexp_replace(p_name, '[aeiou]', '_', 'g')         AS name_masked,
       CAST(regexp_matches(p_type, '^(ECONOMY|PROMO)') AS BOOLEAN) AS is_promo_eco
FROM part
""",
)
def regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / regexp_replace / rlike. Patterns restricted to the
    Java∩RE2 common dialect (character classes, alternation, anchors).
    Note DuckDB regexp_replace needs the 'g' flag to match Spark's
    replace-all semantics."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("name_masked"),
        F.col("p_type").rlike(r"^(ECONOMY|PROMO)").alias("is_promo_eco"),
    )


@query(
    "date_funcs",
    category="F3",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER)          AS y,
       CAST(month(o_orderdate) AS INTEGER)         AS m,
       CAST(day(o_orderdate) AS INTEGER)           AS d,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INTEGER) AS days_to_y2k
FROM orders
""",
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/dayofweek/date_trunc/datediff. Dialect shims: Spark
    dayofweek is 1=Sunday..7 while DuckDB's is 0=Sunday..6 (+1 in oracle);
    Spark datediff(end, start) ≡ DuckDB date_diff('day', start, end)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("m"),
        F.dayofmonth("o_orderdate").cast("int").alias("d"),
        F.dayofweek("o_orderdate").cast("int").alias("dow"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(F.lit("2000-01-01").cast("date"), F.to_date("o_orderdate"))
        .cast("int")
        .alias("days_to_y2k"),
    )


@query(
    "math_funcs",
    category="F4",
    oracle="""
SELECT o_orderkey,
       abs(o_totalprice - 100000)             AS dist_100k,
       CAST(ceil(o_totalprice / 1000) AS BIGINT)  AS price_kilo_ceil,
       CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_kilo_floor,
       sqrt(o_totalprice)                     AS price_sqrt,
       round(pow(o_totalprice / 100000, 2), 6) AS price_sq,
       round(ln(o_totalprice), 6)             AS price_ln,
       round(exp(o_totalprice / 500000), 6)   AS price_exp,
       CAST(sign(o_totalprice - 150000) AS INTEGER) AS above_150k,
       CAST(o_orderkey % 7 AS BIGINT)         AS key_mod7
FROM orders
""",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/ceil/floor/sqrt/pow/log/exp/sign/mod. Arithmetic and sqrt are
    IEEE-correctly-rounded → emitted raw; transcendentals (ln/pow/exp) differ
    in the last ulp across libm implementations → round 6. ceil/floor/sign
    need explicit result-type casts (dialect return types differ). Positive
    operands only for %, where dialects agree."""
    o = load(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.abs(price - 100000).alias("dist_100k"),
        F.ceil(price / 1000).alias("price_kilo_ceil"),
        F.floor(price / 1000).alias("price_kilo_floor"),
        F.sqrt(price).alias("price_sqrt"),
        F.round(F.pow(price / 100000, F.lit(2)), 6).alias("price_sq"),
        F.round(F.log(price), 6).alias("price_ln"),
        F.round(F.exp(price / 500000), 6).alias("price_exp"),
        F.signum(price - 150000).cast("int").alias("above_150k"),
        (F.col("o_orderkey") % 7).cast("long").alias("key_mod7"),
    )


@query(
    "conditional_funcs",
    category="F5",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 1000 THEN 'low'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'high' END                                  AS tier,
       coalesce(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER')   AS seg_or_other,
       greatest(c_acctbal, 0.0)                              AS bal_floor0,
       least(c_acctbal, 9999.0)                              AS bal_cap
FROM customer
""",
)
def conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN chain, coalesce/nullif, greatest/least."""
    c = load(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(bal < 0, "debt")
        .when(bal < 1000, "low")
        .when(bal < 5000, "mid")
        .otherwise("high")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.greatest(bal, F.lit(0.0)).alias("bal_floor0"),
        F.least(bal, F.lit(9999.0)).alias("bal_cap"),
    )


@query(
    "cast_funcs",
    category="F6",
    oracle="""
SELECT e.event_id,
       CAST(floor(e.value) AS BIGINT)                       AS value_floor_int,
       CAST(e.user_id AS VARCHAR)                           AS user_str,
       TRY_CAST(json_extract_string(e.props, '$.k') AS INTEGER) AS k_try,
       TRY_CAST(e.event_type AS INTEGER)                    AS bad_cast
FROM events e
""",
)
def cast_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts incl. try_cast failure→NULL. Double→int goes through floor()
    because raw CAST semantics differ (Spark truncates, DuckDB rounds)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.floor("value").cast("long").alias("value_floor_int"),
        F.col("user_id").cast("string").alias("user_str"),
        F.try_to_number(
            F.get_json_object("props", "$.k"), F.lit("999")
        ).cast("int").alias("k_try"),
        F.col("event_type").try_cast("int").alias("bad_cast"),
    )


@query(
    "array_funcs",
    category="F7",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INTEGER)                          AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER)           AS n_distinct,
       CAST(list_contains(string_split(text, ' '), 'scan') AS BOOLEAN)        AS has_scan,
       array_to_string(list_sort(list_slice(string_split(text, ' '), 1, 3)), ',') AS first3_sorted,
       CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS BIGINT) AS total_chars,
       CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 4)) AS INTEGER) AS n_long_tokens
FROM documents
""",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family incl. higher-order transform/filter/aggregate. Output is
    scalars (sizes/joined strings), not raw arrays, to keep hashing
    canonical across engines."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("int").alias("n_distinct"),
        F.array_contains(toks, "scan").alias("has_scan"),
        F.concat_ws(",", F.sort_array(F.slice(toks, 1, 3))).alias("first3_sorted"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("total_chars"),
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).cast("int").alias(
            "n_long_tokens"
        ),
    )


@query(
    "map_funcs",
    category="F8",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS views,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases
  FROM events GROUP BY user_id
)
SELECT user_id, 'purchases,views' AS map_keys_sorted, views, purchases,
       views + purchases AS total_vp
FROM per_user
ORDER BY user_id
""",
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: build a map column (create_map), read it back via
    element_at / map_keys. The oracle states the equivalent relational
    semantics (DuckDB's MAP→pandas rendering is not hash-canonical, so the
    map is consumed, not emitted)."""
    e = load(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("views"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("purchases"),
    )
    m = F.create_map(
        F.lit("views"), F.col("views"), F.lit("purchases"), F.col("purchases")
    )
    return (
        per_user.select("user_id", m.alias("vp"))
        .select(
            "user_id",
            F.concat_ws(",", F.sort_array(F.map_keys("vp"))).alias("map_keys_sorted"),
            F.element_at("vp", "views").alias("views"),
            F.element_at("vp", "purchases").alias("purchases"),
            F.aggregate(
                F.map_values("vp"), F.lit(0).cast("long"), lambda acc, v: acc + v
            ).alias("total_vp"),
        )
        .orderBy("user_id")
    )


@query(
    "json_struct_projection",
    category="F9",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
            THEN 'hi' ELSE 'lo' END AS k_bucket
FROM events
""",
)
def json_struct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json into a typed struct, then nested-field projection
    (complements core.py's get_json_object aggregate)."""
    e = load(spark, sf_dir, "events")
    parsed = e.select(
        "event_id", F.from_json("props", "k INT").alias("p")
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        F.when(F.col("p.k") >= 50, "hi").otherwise("lo").alias("k_bucket"),
    )


@query(
    "try_arithmetic",
    category="F4,E43",
    oracle="""
SELECT p_partkey,
       round(p_retailprice / nullif(p_size - 25, 0), 4) AS price_per_size,
       TRY_CAST(substr(p_brand, 7) AS INTEGER) AS brand_num,
       CASE WHEN p_size - 25 = 0 THEN NULL
            ELSE round(p_retailprice / (p_size - 25), 4) END AS checked_div
FROM part
ORDER BY p_partkey
""",
)
def try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_divide / try_cast: NULL-on-failure arithmetic under ANSI mode.

    Spark 4 runs ANSI by default (tune() pins it), so 1/0 and bad casts
    THROW — correct for data quality, fatal for exploratory pipelines. The
    try_* family gives per-row graceful degradation without flipping the
    session-wide dial: division by zero and unparseable casts yield NULL,
    everything else stays strict. DuckDB's nullif-guarded division and
    TRY_CAST are the semantic twins.
    """
    p = load(spark, sf_dir, "part")
    denom = F.col("p_size") - F.lit(25)
    return (
        p.select(
            "p_partkey",
            F.round(F.try_divide(F.col("p_retailprice"), denom), 4).alias(
                "price_per_size"
            ),
            F.expr("try_cast(substring(p_brand, 7, 10) AS INT)").alias("brand_num"),
            F.when(denom == 0, F.lit(None).cast("double"))
            .otherwise(F.round(F.col("p_retailprice") / denom, 4))
            .alias("checked_div"),
        )
        .orderBy("p_partkey")
    )


@query(
    "variant_json_shredding",
    category="F9,E57",
    oracle="""
SELECT event_type,
       CAST(count(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS n_k,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def variant_json_shredding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON through Spark 4's VARIANT type: parse once
    into the binary variant encoding, navigate with variant_get.

    Versus F9's get_json_object (re-parses the JSON string per
    extraction), parse_json shreds once into a binary form that ALL
    downstream path accesses share — the engine-native semi-structured
    path (same design as the open variant spec parquet is adopting).
    With one field the gain is modest; with wide props payloads it's one
    parse instead of N. The oracle reads the same field via DuckDB's
    JSON machinery — values agree because both coerce through the same
    JSON-int semantics.
    """
    e = load(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(k).alias("n_k"),
            F.sum(k).alias("sum_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


@query(
    "month_arithmetic_clamping",
    category="F3,E76",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate + INTERVAL 1 MONTH, '%Y-%m-%d') AS plus_month,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       CAST((2000 * 12 + 1) - (year(o_orderdate) * 12 + month(o_orderdate))
            AS BIGINT) AS month_boundaries_to_y2k
FROM orders
WHERE day(o_orderdate) >= 28
ORDER BY o_orderkey
""",
)
def month_arithmetic_clamping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-month arithmetic on month-end dates — the classic trap:
    Jan 31 + 1 month must CLAMP to Feb 28/29, not overflow into March.
    Filtered to day >= 28 so every row exercises the clamping band.

    add_months and last_day are chronology-aware built-ins (no epoch
    arithmetic can express them); both engines clamp identically, which
    this query pins as a cross-engine contract. The month-boundary count
    is EXPLICIT year*12+month arithmetic on both sides — Spark's
    months_between is fractional (31-day months count ~0.5 at mid-month)
    while DuckDB's date_diff('month') counts boundaries; neither matches
    the other, so the portable form is the spelled-out index. That
    dialect trap is the second thing this query documents.
    """
    o = load(spark, sf_dir, "orders").filter(F.dayofmonth("o_orderdate") >= 28)
    return o.select(
        "o_orderkey",
        F.date_format(F.add_months("o_orderdate", 1), "yyyy-MM-dd").alias(
            "plus_month"
        ),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        (
            F.lit(2000 * 12 + 1)
            - (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        )
        .cast("bigint")
        .alias("month_boundaries_to_y2k"),
    ).orderBy("o_orderkey")
