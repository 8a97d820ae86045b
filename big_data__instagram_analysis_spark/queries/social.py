"""Social/log-analytics domain queries (SURVEY.md §2 grounding tag "IG").

The reference's domain is Instagram-style engagement analytics; these queries
are the workload shapes such an analysis actually runs — hashtag leaderboards,
conversion funnels, cohort retention, DAU/MAU stickiness, error monitoring —
each composed from already-proven §2 operators (joins, windows, conditional
aggs, regex extraction) and each hash-checked against the DuckDB oracle.

Every query keeps the scale discipline of the §2 rows it composes: hashtag
explode is a flatMap (no driver loop), funnels/cohorts are two-phase aggs on
user_id (the natural shuffle key), and nothing materializes per-user state
outside the keyed aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load
from ..numeric import cents_sum
from ..registry import query

# --- hashtag leaderboard ------------------------------------------------------


@query(
    "hashtag_top5_per_lang",
    category="F2,W2,L4,E11",
    oracle="""
WITH tagged AS (  -- fixture text carries no literal hashtags (verified 0 at
                  -- every SF): promote 4 marker words to #tags first, the
                  -- same deterministic rewrite on both engines
  SELECT lang,
         regexp_replace(text, '\\b(vector|window|stream|filter)\\b',
                        '#\\1', 'g') AS text
  FROM documents
), tags AS (
  SELECT lang, lower(tag) AS tag
  FROM tagged, unnest(regexp_extract_all(text, '#\\w+')) AS t(tag)
), counts AS (
  SELECT lang, tag, count(*) AS n
  FROM tags GROUP BY lang, tag
), ranked AS (
  SELECT lang, tag, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, tag) AS rn
  FROM counts
)
SELECT lang, tag, n, CAST(rn AS INTEGER) AS rn
FROM ranked WHERE rn <= 5
ORDER BY lang, rn
""",
)
def hashtag_top5_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 hashtags per language: regex extract-all → explode → count → rank.

    The explode happens executor-side inside codegen (no UDF); the count is
    a two-phase agg on (lang, tag); the rank window shuffles once on lang.
    """
    d = load(spark, sf_dir, "documents").withColumn(
        # No literal '#' exists in the fixture corpus (the original query
        # returned 0 rows at every SF — a vacuous hash). Promote 4 marker
        # words to hashtags with the identical rewrite the oracle applies.
        "text",
        F.regexp_replace(
            "text", r"\b(vector|window|stream|filter)\b", r"#$1"
        ),
    )
    tags = d.select(
        "lang",
        # group index 0 (whole match): Spark defaults to group 1 and raises
        # only when a match actually exists — the latent error the vacuous
        # version never hit.
        F.explode(F.expr(r"regexp_extract_all(text, '#\\w+', 0)")).alias(
            "raw_tag"
        ),
    ).select("lang", F.lower("raw_tag").alias("tag"))
    counts = tags.groupBy("lang", "tag").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("tag"))
    return (
        counts.withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= 5)
        .orderBy("lang", "rn")
    )


# --- conversion funnel --------------------------------------------------------


@query(
    "funnel_view_purchase",
    category="A6,F3,E11",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchased
  FROM events
  GROUP BY user_id
), flags AS (
  SELECT user_id,
         CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END AS viewed,
         CASE WHEN first_view IS NOT NULL AND purchased = 1
                   AND EXISTS (
                     SELECT 1 FROM events e2
                     WHERE e2.user_id = per_user.user_id
                       AND e2.event_type = 'purchase'
                       AND e2.ts >= per_user.first_view
                   )
              THEN 1 ELSE 0 END AS converted
  FROM per_user
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(viewed) AS BIGINT) AS n_viewed,
       CAST(sum(converted) AS BIGINT) AS n_converted,
       round(sum(converted) * 1.0 / nullif(sum(viewed), 0), 4) AS conv_rate
FROM flags
""",
)
def funnel_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view→purchase funnel: per-user conditional aggregation, one shuffle.

    "Converted" = purchased at-or-after the first view. Both the first-view
    timestamp and the conditional purchase check fold into ONE groupBy pass
    (min/max of CASE expressions) — no self-join, no per-user driver logic;
    the oracle's EXISTS subquery is expressed as max(ts of purchase) >=
    first_view inside the same aggregation.
    """
    e = load(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "last_purchase"
        ),
    )
    flags = per_user.select(
        F.when(F.col("first_view").isNotNull(), 1).otherwise(0).alias("viewed"),
        F.when(
            F.col("first_view").isNotNull()
            & (F.col("last_purchase") >= F.col("first_view")),
            1,
        )
        .otherwise(0)
        .alias("converted"),
    )
    return flags.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("viewed").alias("n_viewed"),
        F.sum("converted").alias("n_converted"),
        F.round(
            F.sum("converted") / F.nullif(F.sum("viewed"), F.lit(0)), 4
        ).alias("conv_rate"),
    )


# --- DAU / MAU stickiness -----------------------------------------------------


@query(
    "dau_mau_stickiness",
    category="A3,F3,E11",
    oracle="""
WITH dau AS (
  SELECT strftime(ts, '%Y-%m') AS month, strftime(ts, '%Y-%m-%d') AS day,
         count(DISTINCT user_id) AS dau
  FROM events GROUP BY 1, 2
), mau AS (
  SELECT strftime(ts, '%Y-%m') AS month, count(DISTINCT user_id) AS mau
  FROM events GROUP BY 1
)
SELECT d.month, round(avg(d.dau), 4) AS avg_dau, CAST(m.mau AS BIGINT) AS mau,
       round(avg(d.dau) / m.mau, 4) AS stickiness
FROM dau d JOIN mau m ON d.month = m.month
GROUP BY d.month, m.mau
ORDER BY d.month
""",
)
def dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avg-DAU / MAU per month — the classic engagement-stickiness ratio.

    Two count-distinct aggregations at different grains joined on month; the
    month dimension is tiny so the join broadcasts.
    """
    e = load(spark, sf_dir, "events")
    base = e.select(
        F.date_format("ts", "yyyy-MM").alias("month"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "user_id",
    )
    dau = base.groupBy("month", "day").agg(
        F.countDistinct("user_id").alias("dau")
    )
    mau = base.groupBy("month").agg(F.countDistinct("user_id").alias("mau"))
    return (
        dau.join(F.broadcast(mau), "month")
        .groupBy("month", "mau")
        .agg(
            F.round(F.avg("dau"), 4).alias("avg_dau"),
            F.round(F.avg("dau") / F.first("mau"), 4).alias("stickiness"),
        )
        .select("month", "avg_dau", "mau", "stickiness")
        .orderBy("month")
    )


# --- cohort retention ---------------------------------------------------------


@query(
    "cohort_weekly_retention",
    category="W4,F3,J1,E11",
    oracle="""
WITH firsts AS (
  SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(date_diff('week', f.cohort_week, date_trunc('week', e.ts)) AS INTEGER)
           AS week_offset
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week, week_offset,
       count(*) AS n_users
FROM activity
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
""",
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: cohort by first-active week × week offset.

    first-week per user is one keyed agg; the offset join is user_id-keyed
    (same shuffle partitioning reused); DISTINCT collapses multiple events
    per user-week before the final small aggregation.
    """
    e = load(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.date_trunc("week", "ts")).alias("cohort_week")
    )
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.floor(
                    (
                        F.unix_timestamp(F.date_trunc("week", "ts"))
                        - F.unix_timestamp("cohort_week")
                    )
                    / (7 * 86400)
                )
            )
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


# --- error-rate monitoring ----------------------------------------------------


@query(
    "error_rate_daily",
    category="A6,F3,E11",
    oracle="""
SELECT strftime(ts, '%Y-%m-%d') AS day,
       count(*) AS n_events,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_errors,
       round(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 1.0
             / count(*), 4) AS error_rate
FROM events
GROUP BY day
ORDER BY day
""",
)
def error_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily error rate: conditional agg over the event log (ops dashboard)."""
    e = load(spark, sf_dir, "events")
    is_err = F.when(F.col("event_type") == "error", 1).otherwise(0)
    return (
        e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(is_err).alias("n_errors"),
            F.round(F.sum(is_err) / F.count(F.lit(1)), 4).alias("error_rate"),
        )
        .orderBy("day")
    )


# --- engagement ranking across the star schema --------------------------------


@query(
    "engagement_rank_by_segment",
    category="J1,W1,A1,E11",
    oracle="""
WITH per_user AS (
  SELECT e.user_id, c.c_mktsegment AS segment,
         round(sum(e.value), 2) AS total_value,
         count(*) AS n_events
  FROM events e JOIN customer c ON e.user_id = c.c_custkey
  GROUP BY e.user_id, c.c_mktsegment
)
SELECT segment, user_id, total_value, n_events,
       CAST(dense_rank() OVER (PARTITION BY segment
                               ORDER BY total_value DESC, user_id) AS INTEGER)
         AS seg_rank
FROM per_user
ORDER BY segment, seg_rank, user_id
""",
)
def engagement_rank_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement leaderboard per market segment: star join + dense_rank.

    Customer is the broadcast dim; the per-user agg shuffles on user_id; the
    rank window re-shuffles on segment only after the data is reduced to one
    row per user.
    """
    e = load(spark, sf_dir, "events")
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("segment")
    )
    per_user = (
        e.join(F.broadcast(c), e.user_id == c.c_custkey)
        .groupBy("user_id", "segment")
        .agg(
            F.round(F.sum("value"), 2).alias("total_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    w = Window.partitionBy("segment").orderBy(F.desc("total_value"), F.asc("user_id"))
    return per_user.select(
        "segment",
        "user_id",
        "total_value",
        "n_events",
        F.dense_rank().over(w).cast("int").alias("seg_rank"),
    ).orderBy("segment", "seg_rank", "user_id")


@query(
    "mom_growth_share",
    category="W3,E66",
    oracle="""
WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
  FROM orders GROUP BY month
)
SELECT month, revenue,
       round(revenue - lag(revenue) OVER (ORDER BY month), 2) AS mom_delta,
       round(100.0 * (revenue - lag(revenue) OVER (ORDER BY month))
             / lag(revenue) OVER (ORDER BY month), 4) AS mom_pct,
       round(100.0 * revenue /
             (sum(CAST(floor(revenue * 100 + 0.5) AS BIGINT)) OVER () / 100.0),
             4) AS share_pct
FROM m
ORDER BY month
""",
)
def mom_growth_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month growth and share-of-total: the reporting staple
    (lag on an aggregated series + ratio-to-report window).

    The windows run on the 80-row monthly AGGREGATE, not the fact table —
    aggregate first, window the summary. The unpartitioned lag/sum
    windows are single-partition by definition, which is fine precisely
    because the input is |months| rows; running them pre-aggregation
    would be the E44 cliff. Derived values compute from the ROUNDED
    revenue on both engines, so quotients can't straddle round
    boundaries.
    """
    o = load(spark, sf_dir, "orders")
    m = o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month")).agg(
        cents_sum(F.col("o_totalprice")).alias("revenue")
    )
    w = Window.orderBy("month")
    lag_rev = F.lag("revenue").over(w)
    return m.select(
        "month",
        "revenue",
        F.round(F.col("revenue") - lag_rev, 2).alias("mom_delta"),
        F.round(100.0 * (F.col("revenue") - lag_rev) / lag_rev, 4).alias("mom_pct"),
        F.round(
            100.0
            * F.col("revenue")
            / (
                F.sum(
                    F.floor(F.col("revenue") * 100 + F.lit(0.5)).cast("bigint")
                ).over(Window.partitionBy())
                / 100.0
            ),
            4,
        ).alias("share_pct"),
    ).orderBy("month")


@query(
    "anomaly_zscore_daily",
    category="W6,E67",
    oracle="""
WITH d AS (
  SELECT epoch_ns(ts) // 86400000000000 AS day_b,
         CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY day_b
), z AS (
  SELECT day_b, n,
         avg(n) OVER w AS mu,
         sqrt((sum(n * n) OVER w - sum(n) OVER w * sum(n) OVER w
               / count(*) OVER w) / (count(*) OVER w - 1)) AS sd,
         count(*) OVER w AS nw
  FROM d
  WINDOW w AS (ORDER BY day_b ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT CAST(day_b AS BIGINT) AS day_b, CAST(n AS BIGINT) AS n_events,
       round((n - mu) / sd, 4) AS z
FROM z
WHERE nw = 7 AND sd > 0
ORDER BY day_b
""",
)
def anomaly_zscore_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly score: each day's event count vs the
    mean/std of its own trailing week — the volume-spike detector.

    Why this one MAY emit a std into hash-checked output when E27
    couldn't: the window inputs are INTEGER counts, so the 7-term sums
    and sum-of-squares are exact in both engines regardless of order —
    the float path (divide, sqrt, round) is then bit-identical IEEE.
    Cent-valued doubles (E27) never get that exactness. Warm-up days
    (window shorter than 7) are excluded rather than scored against a
    partial baseline.
    """
    d = (
        load(spark, sf_dir, "events")
        .groupBy(
            (F.col("ts_ns") / F.lit(86_400_000_000_000)).cast("bigint").alias("day_b")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    w = Window.orderBy("day_b").rowsBetween(-6, Window.currentRow)
    nw = F.count(F.lit(1)).over(w)
    s1 = F.sum("n").over(w)
    s2 = F.sum(F.col("n") * F.col("n")).over(w)
    mu = F.avg("n").over(w)
    sd = F.sqrt((s2 - s1 * s1 / nw) / (nw - 1))
    z = d.select(
        "day_b",
        F.col("n").cast("bigint").alias("n_events"),
        F.round((F.col("n") - mu) / sd, 4).alias("z"),
        nw.alias("nw"),
        sd.alias("sd"),
    )
    return (
        z.filter((F.col("nw") == 7) & (F.col("sd") > 0))
        .select("day_b", "n_events", "z")
        .orderBy("day_b")
    )


@query(
    "mode_event_type_per_user",
    category="A6,E69",
    oracle="""
WITH counts AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY user_id, event_type
), ranked AS (
  SELECT user_id, event_type, n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type) AS rn
  FROM counts
)
SELECT user_id, event_type AS mode_type, CAST(n AS BIGINT) AS n
FROM ranked WHERE rn = 1
ORDER BY user_id
""",
)
def mode_event_type_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode (most frequent value) per user: count, then
    rank with an explicit tie-break (alphabetical on equal counts).

    Spark ships F.mode(), but its tie-breaking is undefined — unusable
    where results must be reproducible (and un-parity-checkable). The
    count+rank form costs one extra exchange and buys a total order;
    that trade is the right default in any audited pipeline.
    """
    counts = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), "event_type")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), "n")
        .orderBy("user_id")
    )


@query(
    "event_pair_pmi",
    category="A1,E75",
    oracle="""
WITH ue AS (
  SELECT DISTINCT user_id, event_type FROM events
), nu AS (
  SELECT CAST(count(DISTINCT user_id) AS DOUBLE) AS n FROM events
), marg AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS m FROM ue GROUP BY event_type
), pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         CAST(count(*) AS DOUBLE) AS c
  FROM ue a JOIN ue b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY ta, tb
)
SELECT ta, tb, CAST(c AS BIGINT) AS n_users,
       round(ln((c / (SELECT n FROM nu))
                / ((x.m / (SELECT n FROM nu)) * (y.m / (SELECT n FROM nu)))), 6)
         AS pmi
FROM pairs JOIN marg x ON ta = x.event_type JOIN marg y ON tb = y.event_type
ORDER BY ta, tb
""",
)
def event_pair_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between event types at user level:
    which behaviors co-occur beyond chance — the association measure
    behind market-basket and co-engagement analysis.

    Everything reduces before it joins: the distinct (user, type) set is
    the only row-scale relation; the self-join runs on it (bounded by
    |users|×|types|), and marginals/pair counts are tiny. PMI is pure
    arithmetic over exact counts — ln of count ratios is identical IEEE
    on both engines, so it hash-checks.

    Round 13 (guide §1.2): ue feeds FOUR consumers (marg, both self-join
    sides, and the user total — distinct users over events ≡ distinct
    users over ue), and the total was an EAGER count, so the corpus
    distinct ran up to four times per invocation. One lazy localCheckpoint
    materializes ue once; n_users rides as the lazy 1-row crossJoin scalar
    (exact long cast to double ≡ float(count) bit-for-bit).
    """
    e = load(spark, sf_dir, "events")
    ue = (
        e.select("user_id", "event_type")
        .distinct()
        .localCheckpoint(eager=False)
    )
    nu = ue.agg(
        F.countDistinct("user_id").cast("double").alias("__n_users")
    )
    marg = ue.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("m")
    )
    a, b = ue.alias("a"), ue.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("ta"), F.col("b.event_type").alias("tb")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    x = marg.select(F.col("event_type").alias("ta"), F.col("m").alias("mx"))
    y = marg.select(F.col("event_type").alias("tb"), F.col("m").alias("my"))
    n_users = F.col("__n_users")
    return (
        pairs.join(F.broadcast(x), "ta")
        .join(F.broadcast(y), "tb")
        .crossJoin(F.broadcast(nu))
        .select(
            "ta",
            "tb",
            F.col("c").cast("bigint").alias("n_users"),
            F.round(
                F.log(
                    (F.col("c") / n_users)
                    / ((F.col("mx") / n_users) * (F.col("my") / n_users))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy("ta", "tb")
    )


@query(
    "seasonal_naive_forecast_eval",
    category="W3,E77",
    oracle="""
WITH daily AS (
  SELECT epoch_ns(ts) // 86400000000000 AS day_b,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS v
  FROM events GROUP BY day_b
), f AS (
  SELECT day_b, v, lag(v, 7) OVER (ORDER BY day_b) AS pred
  FROM daily
)
SELECT CAST(count(*) AS BIGINT) AS n_days,
       round(avg(abs(v - pred)), 4) AS mae,
       round(avg(abs(v - pred) / nullif(v, 0)), 6) AS mape
FROM f WHERE pred IS NOT NULL
""",
)
def seasonal_naive_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecasting baseline evaluated in-engine: predict
    each day's total as the value seven days earlier, score MAE/MAPE over
    the covered window — the baseline every real forecast model must
    beat, and the eval-loop shape (predict → join actuals → error agg)
    that any model comparison reuses.

    The lag runs on the |days|-row aggregate (aggregate first, window
    the summary — E66's rule); warm-up days without a 7-back observation
    are excluded, not scored as zero. Error math starts from the ROUNDED
    daily totals so both engines difference identical doubles.
    """
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            # exact integer `div` (double / has a ~256 ns ulp at 1.7e18 ns)
            F.expr("ts_ns div 86400000000000").alias("day_b")
        )
        .agg(
            (
                F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
                / 100.0
            ).alias("v")
        )
    )
    w = Window.orderBy("day_b")
    f = daily.withColumn("pred", F.lag("v", 7).over(w)).filter(
        F.col("pred").isNotNull()
    )
    err = F.abs(F.col("v") - F.col("pred"))
    return f.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.avg(err), 4).alias("mae"),
        F.round(F.avg(err / F.nullif(F.col("v"), F.lit(0.0))), 6).alias("mape"),
    )


@query(
    "weekday_hour_seasonality",
    category="A1,E78",
    oracle="""
SELECT CAST((epoch_ns(ts) // 86400000000000 + 4) % 7 AS INT) AS dow,
       CAST((epoch_ns(ts) // 3600000000000) % 24 AS INT) AS hod,
       CAST(count(*) AS BIGINT) AS n,
       sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS total
FROM events
GROUP BY dow, hod
ORDER BY dow, hod
""",
)
def weekday_hour_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity heat matrix — the seasonality
    profile behind staffing, anomaly baselines, and send-time choices.

    Both calendar coordinates come from epoch-day/epoch-hour integer
    arithmetic (1970-01-01 was a Thursday, hence the +4): no timezone, no
    calendar library, identical on any engine — the ts_ns discipline
    (§5.4) extended to calendar features. The matrix is 7×24 whatever
    the event volume; one map-side-combinable aggregation.
    """
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            (((F.col("ts_ns") / F.lit(86_400_000_000_000)).cast("bigint") + 4) % 7)
            .cast("int")
            .alias("dow"),
            ((F.col("ts_ns") / F.lit(3_600_000_000_000)).cast("bigint") % 24)
            .cast("int")
            .alias("hod"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            # Round-11 ×10 audit flag (4e5 magnitude): cents-exact sum.
            cents_sum("value").alias("total"),
        )
        .orderBy("dow", "hod")
    )


@query(
    "gini_engagement_inequality",
    category="A2,E79",
    oracle="""
WITH cnt AS (
  SELECT user_id, CAST(count(*) AS DOUBLE) AS x FROM events GROUP BY user_id
), ranked AS (
  SELECT x, row_number() OVER (ORDER BY x, user_id) AS i,
         count(*) OVER () AS n, sum(x) OVER () AS sx
  FROM cnt
)
SELECT CAST(max(n) AS BIGINT) AS n_users,
       round((2.0 * sum(i * x)) / (max(n) * max(sx))
             - (max(n) + 1.0) / max(n), 6) AS gini
FROM ranked
""",
)
def gini_engagement_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user event counts: one number for how
    concentrated engagement is (0 = everyone equal, →1 = a few power
    users dominate) — the skew indicator that predicts which keys will
    hot-spot every user-keyed shuffle (E5's salting exists because this
    number is high in real logs).

    Rank-weighted formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over counts
    sorted ascending (ties broken by user id). The window runs on the
    |users|-row aggregate; counts are integers so every product and sum
    is exact until the final two divisions — hash-safe like E67.
    """
    cnt = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
    )
    w = Window.orderBy("x", "user_id")
    ranked = cnt.select(
        "x",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        F.sum("x").over(Window.partitionBy()).alias("sx"),
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_users"),
        F.round(
            (2.0 * F.sum(F.col("i") * F.col("x"))) / (F.max("n") * F.max("sx"))
            - (F.max("n") + 1.0) / F.max("n"),
            6,
        ).alias("gini"),
    )
