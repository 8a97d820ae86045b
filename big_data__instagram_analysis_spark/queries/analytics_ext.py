"""Analytics extensions (SURVEY.md §2.12 E164, E169, E172, E175).

Nearest-direction as-of join with tolerance, exact weighted median,
cumulative-new-entities growth accounting, and hierarchical share-of-parent
ratios. Determinism follows the suite conventions: integer time (ns),
integer cents/weights, share ratios emitted as floor(x*scale+0.5) BIGINTs
(engine round() diverges at double half-boundaries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load
from ..operators.asof import asof_join_nearest
from ..registry import query

# --- E164: nearest as-of join with tolerance ---------------------------------

_TOL_NS = 30 * 24 * 3600 * 1_000_000_000  # ±30 days
_BIG = 250_000  # totalprice split: "big" orders look up their nearest small one

_NEAREST = f"""
WITH o AS (
  SELECT o_orderkey, o_custkey,
         epoch_ns(o_orderdate) AS ons,
         strftime(o_orderdate, '%Y-%m-%d') AS d,
         o_totalprice
  FROM orders
), big AS (SELECT * FROM o WHERE o_totalprice > {_BIG}),
small AS (SELECT * FROM o WHERE o_totalprice <= {_BIG})
SELECT b.o_orderkey AS big_order, b.o_custkey AS custkey, b.d AS big_date,
       n.small_date, round(n.price, 2) AS small_price,
       CAST(n.gap_ns // 86400000000000 AS BIGINT) AS gap_days
FROM big b
JOIN LATERAL (
  SELECT s.d AS small_date, s.o_totalprice AS price,
         abs(s.ons - b.ons) AS gap_ns
  FROM small s
  WHERE s.o_custkey = b.o_custkey AND abs(s.ons - b.ons) <= {_TOL_NS}
  ORDER BY abs(s.ons - b.ons), s.ons, s.o_orderkey
  LIMIT 1
) n ON TRUE
ORDER BY big_order
"""


@query("asof_nearest_order", category="E164,J8", oracle=_NEAREST)
def asof_nearest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (pandas merge_asof direction='nearest'):
    each big order (> $250k) finds the same customer's CLOSEST small order
    within ±30 days — backward or forward, whichever is nearer, backward
    preferred on exact ties. (An events→orders variant would be vacuous:
    the fixture's orders live in 1995-2001 and events in 2024 — verified
    empty at every SF, so this self-temporal shape keeps the check real:
    95 matches at sf0.001, 861 at sf0.01.)

    Scale: NOT a per-row lateral re-scan (that's only the oracle's
    spelling). Two passes of the union+window as-of machinery — backward
    as-is, forward by negating the integer-ns axis (greatest −t' ≤ −t ⇔
    smallest t' ≥ t) — then an argmin on the two candidate gaps
    (operators/asof.py asof_join_nearest, fuzzed vs pandas in
    tests/test_analytics_ext.py). Each pass is one shuffle on (key, ts).

    Right-side ties: two small orders the same day would make LIMIT 1
    depend on o_orderkey order the operator doesn't see, so the right
    side dedupes to one row per (custkey, day) keeping the lowest
    orderkey — matching the oracle's ORDER BY gap, ons, o_orderkey.
    """
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        (
            F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))") * F.lit(1000)
        ).alias("ons"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
        "o_totalprice",
    )
    big = o.where(F.col("o_totalprice") > _BIG).select(
        F.col("o_orderkey").alias("big_order"),
        F.col("o_custkey").alias("custkey"),
        F.col("d").alias("big_date"),
        "ons",
    )
    # One row per (custkey, day): min orderkey's price — the oracle's
    # deterministic tiebreak, applied before the join.
    small = (
        o.where(F.col("o_totalprice") <= _BIG)
        .groupBy("o_custkey", "ons")
        .agg(
            F.min_by("o_totalprice", "o_orderkey").alias("price"),
            F.min("d").alias("small_date"),
        )
    )
    out = asof_join_nearest(
        big,
        small,
        key="custkey",
        right_key="o_custkey",
        left_ts="ons",
        right_ts="ons",
        payload=["small_date", "price"],
        tolerance=_TOL_NS,
    )
    return out.select(
        "big_order",
        "custkey",
        "big_date",
        "small_date",
        F.round("price", 2).alias("small_price"),
        (F.col("__gap") / F.lit(86_400_000_000_000)).cast("bigint").alias(
            "gap_days"
        ),
    ).orderBy("big_order")


# --- E169: exact weighted median ---------------------------------------------

_WMEDIAN = """
WITH u AS (
  SELECT l_returnflag AS flag,
         CAST(floor(l_extendedprice / l_quantity * 100 + 0.5) AS BIGINT)
           AS unit_cents,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
), grouped AS (
  SELECT flag, unit_cents, CAST(sum(w) AS BIGINT) AS w
  FROM u GROUP BY flag, unit_cents
), cum AS (
  SELECT flag, unit_cents, w,
         sum(w) OVER (PARTITION BY flag ORDER BY unit_cents
                      ROWS UNBOUNDED PRECEDING) AS cw,
         sum(w) OVER (PARTITION BY flag) AS tot
  FROM grouped
)
SELECT flag,
       CAST(min(unit_cents) AS BIGINT) AS wmedian_cents,
       CAST(min(tot) AS BIGINT) AS total_weight
FROM cum
WHERE 2 * cw >= tot
GROUP BY flag
ORDER BY flag
"""


@query("weighted_median_unitprice", category="E169,A7", oracle=_WMEDIAN)
def weighted_median_unitprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted median unit price per return flag — the
    lower weighted median (first value whose cumulative weight reaches
    half the total), the volume-aware center plain median misses.

    Scale: values collapse to the DISTINCT (flag, unit_cents) domain FIRST
    (one partial-agg shuffle — the domain is bounded by price granularity,
    not row count), then one cumulative-sum window per flag over that
    compacted domain. All weight math in exact integers: the 2·cw ≥ tot
    test cannot float-flip, and duplicate values can't split across the
    threshold because they were pre-merged.
    """
    li = load(spark, sf_dir, "lineitem")
    unit_cents = F.floor(
        F.col("l_extendedprice") / F.col("l_quantity") * 100 + F.lit(0.5)
    ).cast("bigint")
    grouped = (
        li.select(
            F.col("l_returnflag").alias("flag"),
            unit_cents.alias("unit_cents"),
            F.col("l_quantity").cast("bigint").alias("w"),
        )
        .groupBy("flag", "unit_cents")
        .agg(F.sum("w").alias("w"))
    )
    wc = Window.partitionBy("flag").orderBy("unit_cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.partitionBy("flag")
    cum = grouped.select(
        "flag",
        "unit_cents",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(wt).alias("tot"),
    )
    return (
        cum.where(2 * F.col("cw") >= F.col("tot"))
        .groupBy("flag")
        .agg(
            F.min("unit_cents").alias("wmedian_cents"),
            F.min("tot").alias("total_weight"),
        )
        .orderBy("flag")
    )


# --- E172: cumulative new users ----------------------------------------------

_CUM_NEW = """
WITH first_day AS (
  SELECT user_id, min(strftime(ts, '%Y-%m-%d')) AS d
  FROM events GROUP BY user_id
), per_day AS (
  SELECT d, CAST(count(*) AS BIGINT) AS n_new FROM first_day GROUP BY d
), active AS (
  SELECT strftime(ts, '%Y-%m-%d') AS d,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
  FROM events GROUP BY d
)
SELECT a.d, coalesce(p.n_new, 0) AS n_new, a.n_active,
       CAST(sum(coalesce(p.n_new, 0)) OVER (ORDER BY a.d
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
FROM active a LEFT JOIN per_day p ON p.d = a.d
ORDER BY a.d
"""


@query("cumulative_new_users", category="E172,A3,W5", oracle=_CUM_NEW)
def cumulative_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per day, first-seen (new) users, active users,
    and the cumulative user base to date — the new/active/cumulative
    triplet behind every growth dashboard, computed without rescanning
    history per day.

    Scale: "new" comes from min(day) per user (one shuffle on user_id —
    each user reduced to one first-seen row, the incremental-friendly
    form; a day×user distinct-over-window would recompute per day),
    actives from one day-grain distinct agg, and the cumulative sum is a
    window over #days rows — trivial however large the fact table.
    """
    e = load(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("d"), "user_id"
    )
    per_day = (
        e.groupBy("user_id")
        .agg(F.min("d").alias("d"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    active = e.groupBy("d").agg(
        F.countDistinct("user_id").alias("n_active")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return (
        active.join(per_day, "d", "left")
        .select(
            "d",
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            "n_active",
        )
        .withColumn("cum_users", F.sum("n_new").over(w).cast("bigint"))
        .orderBy("d")
    )


# --- E175: hierarchical share-of-parent --------------------------------------

_SHARE = """
WITH rev AS (
  SELECT n.n_name AS nation, r.r_name AS region,
         sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS cents
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY n.n_name, r.r_name
), tot AS (
  SELECT nation, region, cents,
         sum(cents) OVER (PARTITION BY region) AS region_cents,
         sum(cents) OVER () AS global_cents
  FROM rev
)
SELECT nation, region,
       round(cents / 100.0, 2) AS revenue,
       CAST(floor(cents * 1000000.0 / region_cents + 0.5) AS BIGINT)
         AS share_of_region_ppm,
       CAST(floor(cents * 1000000.0 / global_cents + 0.5) AS BIGINT)
         AS share_of_global_ppm
FROM tot
ORDER BY region, nation
"""


@query("share_of_parent_revenue", category="E175,W1,A1", oracle=_SHARE)
def share_of_parent_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ratio-to-report: each nation's supplier revenue as a
    share of its region and of the world — the two-level percent-of-parent
    every BI drilldown needs, in one pass.

    Scale: one fact shuffle (join + per-nation agg, dims broadcast-sized),
    then two partial sums as windows over the 25-row aggregate — the
    parent totals are derived FROM the child aggregate, never a second
    fact scan. Money in exact integer cents; shares emitted as
    floor(x·1e6 + 0.5) parts-per-million BIGINTs (identical double
    division of identical integers on both engines; no engine round()).
    """
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    dim = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select(
        "n_nationkey", F.col("n_name").alias("nation"), F.col("r_name").alias("region")
    )
    rev = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(dim), s.s_nationkey == F.col("n_nationkey"))
        .groupBy("nation", "region")
        .agg(F.sum(cents).alias("cents"))
    )
    wr = Window.partitionBy("region")
    wg = Window.partitionBy()
    tot = rev.select(
        "nation",
        "region",
        "cents",
        F.sum("cents").over(wr).alias("region_cents"),
        F.sum("cents").over(wg).alias("global_cents"),
    )
    ppm = lambda parent: F.floor(  # noqa: E731
        F.col("cents") * 1_000_000.0 / F.col(parent) + F.lit(0.5)
    ).cast("bigint")
    return tot.select(
        "nation",
        "region",
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
        ppm("region_cents").alias("share_of_region_ppm"),
        ppm("global_cents").alias("share_of_global_ppm"),
    ).orderBy("region", "nation")


# --- E195: sequential trigram patterns ---------------------------------------

_TRIGRAMS = """
WITH o AS (
  SELECT user_id, event_type, epoch_ns(ts) AS ns, event_id
  FROM events
), seq AS (
  SELECT user_id,
         event_type AS a,
         lead(event_type, 1) OVER (PARTITION BY user_id
                                   ORDER BY ns, event_id) AS b,
         lead(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY ns, event_id) AS c
  FROM o
)
SELECT a || '>' || b || '>' || c AS pattern,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM seq
WHERE b IS NOT NULL AND c IS NOT NULL
GROUP BY pattern
ORDER BY n DESC, pattern
LIMIT 30
"""


@query("event_trigram_patterns", category="E195,W3", oracle=_TRIGRAMS)
def event_trigram_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining (episode-mining lite): the top-30 ordered
    event-type TRIGRAMS across user journeys, with user support — the
    3-step generalization of the Markov transition matrix (2-grams,
    markov_event_transitions) that surfaces multi-step behavioral motifs.

    Scale: two lead() windows over one shuffle on user_id build the
    per-row trigram (no self-joins — the naive 3-way join on adjacency
    shuffles the fact table three times; the window form shuffles once),
    then a count shuffle on the pattern key (≤ |types|³ = 125 groups) with
    map-side combine. The (ns, event_id) order key is a total order, so
    adjacency is engine-independent.
    """
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts_ns", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    seq = e.select(
        "user_id",
        F.col("event_type").alias("a"),
        F.lead("event_type", 1).over(w).alias("b"),
        F.lead("event_type", 2).over(w).alias("c"),
    )
    return (
        seq.where(F.col("b").isNotNull() & F.col("c").isNotNull())
        .select(
            "user_id",
            F.concat_ws(">", "a", "b", "c").alias("pattern"),
        )
        .groupBy("pattern")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n"), "pattern")
        .limit(30)
    )


# --- E204: exact winsorized means --------------------------------------------

_WINSOR = """
WITH v AS (
  SELECT event_type, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
), r AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type ORDER BY c, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM v
), cuts AS (
  SELECT event_type,
         max(CASE WHEN rn = (5 * n + 99) // 100 THEN c END) AS lo,
         max(CASE WHEN rn = n - (5 * n + 99) // 100 + 1 THEN c END) AS hi,
         max(n) AS n
  FROM r GROUP BY event_type
)
SELECT r.event_type,
       CAST(cuts.n AS BIGINT) AS n,
       CAST(cuts.lo AS BIGINT) AS lo_cents,
       CAST(cuts.hi AS BIGINT) AS hi_cents,
       CAST(sum(least(greatest(r.c, cuts.lo), cuts.hi)) AS BIGINT)
         AS winsorized_sum_cents,
       CAST(sum(least(greatest(r.c, cuts.lo), cuts.hi)) * 100 // cuts.n
            AS BIGINT) AS wmean_cents_x100
FROM r JOIN cuts USING (event_type)
GROUP BY r.event_type, cuts.n, cuts.lo, cuts.hi
ORDER BY r.event_type
"""


@query("winsorized_means", category="E204,A7", oracle=_WINSOR)
def winsorized_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5%/95% winsorized mean per event type: rank-based cutoffs
    (value at ceil(0.05·n) and its mirror in a (cents, event_id) total
    order), values clamped — not dropped — then averaged. The robust-mean
    data-cleaning step, engine-side and exact, complementing the U3
    pandas-UDAF trimmed mean (which DROPS the tails and runs in Python).

    Scale: one rank window per type, a 5-row cutoff broadcast joined back,
    then a plain aggregation — all integer-cents math including the
    ceil((5n+99)/100) rank arithmetic, so no float boundary exists
    anywhere. Clamping beats dropping at scale: the aggregate stays a
    single pass with no second filter scan.
    """
    e = load(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    v = e.select("event_type", "event_id", cents.alias("c"))
    wr = Window.partitionBy("event_type").orderBy("c", "event_id")
    wn = Window.partitionBy("event_type")
    r = v.select(
        "event_type",
        "c",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    k_lo = (5 * F.col("n") + 99) / 100
    cuts = r.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == F.floor(k_lo), F.col("c"))
        ).alias("lo"),
        F.max(
            F.when(
                F.col("rn") == F.col("n") - F.floor(k_lo) + 1, F.col("c")
            )
        ).alias("hi"),
        F.max("n").alias("n"),
    )
    clamped = F.least(F.greatest(F.col("c"), F.col("lo")), F.col("hi"))
    return (
        r.select("event_type", "c")
        .join(F.broadcast(cuts.withColumnRenamed("event_type", "et")),
              F.col("event_type") == F.col("et"))
        .groupBy("event_type", "n", "lo", "hi")
        .agg(F.sum(clamped).alias("winsorized_sum_cents"))
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            F.col("lo").cast("bigint").alias("lo_cents"),
            F.col("hi").cast("bigint").alias("hi_cents"),
            "winsorized_sum_cents",
            F.floor(F.col("winsorized_sum_cents") * 100 / F.col("n"))
            .cast("bigint")
            .alias("wmean_cents_x100"),
        )
        .orderBy("event_type")
    )


# --- E206: interval-overlap join via grid bucketing --------------------------

_NS_HOUR_G = 3600 * 1_000_000_000
_GAP_NS = 30 * 60 * 1_000_000_000
# Peak = the 48 busiest hours by event count ((n, cell) DESC rank —
# deterministic and NON-EMPTY at every SF by construction). Two earlier
# definitions degenerated: an absolute cutoff was vacuous at sf0.001
# (max 6 events/hr) and a 1.5x-mean relative cutoff was vacuous at sf0.1
# (dense uniform data flattens relative variance). Rank-based selection
# is the scale-invariant form.
_PEAK_TOPK = 48

_OVERLAP = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_ns(ts) AS ns FROM events
), marked AS (
  SELECT user_id, ns,
         CASE WHEN ns - lag(ns) OVER (PARTITION BY user_id
                                      ORDER BY ns, event_id) > {_GAP_NS}
              THEN 1 ELSE 0 END AS brk
  FROM e
), sess AS (
  SELECT user_id, min(ns) AS s_start, max(ns) AS s_end
  FROM (SELECT user_id, ns,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ns
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked)
  GROUP BY user_id, sid
), hours AS (
  SELECT ns // {_NS_HOUR_G} AS cell, CAST(count(*) AS BIGINT) AS n
  FROM e GROUP BY 1
), ranked AS (
  SELECT cell, row_number() OVER (ORDER BY n DESC, cell) AS rk FROM hours
), peaks AS (
  SELECT cell * {_NS_HOUR_G} AS p_start,
         (cell + 1) * {_NS_HOUR_G} AS p_end
  FROM ranked WHERE rk <= {_PEAK_TOPK}
)
SELECT s.user_id,
       CAST(s.s_start AS BIGINT) AS session_start_ns,
       CAST(p.p_start AS BIGINT) AS peak_start_ns,
       CAST((least(s.s_end, p.p_end) - greatest(s.s_start, p.p_start))
            // 1000000 AS BIGINT) AS overlap_ms
FROM sess s JOIN peaks p
  ON s.s_start < p.p_end AND p.p_start < s.s_end
ORDER BY s.user_id, session_start_ns, peak_start_ns
"""


@query("interval_overlap_sessions", category="E206,J7", oracle=_OVERLAP)
def interval_overlap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: user sessions (30-min-gap sessionization)
    × the 48 busiest hours, with exact overlap duration — the
    generalization of J7's point-in-band range join to interval×interval.

    Scale: the oracle's theta join (s.start < p.end AND p.start < s.end)
    is a nested loop on two unbounded sets. The Spark side GRID-BUCKETS
    instead: every session explodes into the hour cells it touches
    (bounded by session length / cell size), peaks are keyed by their
    hour cell, and the overlap test runs as an EQUI-join on the cell with
    the strict-overlap predicate as a residual — the standard
    interval/spatial binning rewrite. A session spanning k hours meets a
    peak at most once per shared cell and cells are disjoint, so no
    dedup pass is needed: each (session, peak) pair shares exactly one
    cell (the peak's own).
    """
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts_ns").alias("ns")
    )
    w = Window.partitionBy("user_id").orderBy("ns", "event_id")
    brk = (
        F.when(
            F.col("ns") - F.lag("ns").over(w) > _GAP_NS, F.lit(1)
        ).otherwise(F.lit(0))
    )
    sid = F.sum(brk).over(
        Window.partitionBy("user_id")
        .orderBy("ns", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = (
        e.select("user_id", "ns", sid.alias("sid"))
        .groupBy("user_id", "sid")
        .agg(F.min("ns").alias("s_start"), F.max("ns").alias("s_end"))
    )
    # Exact integer `div` on ns values — double `/` has a ~256 ns ulp at
    # 1.7e18, which could flip a boundary-adjacent row vs the oracle's `//`.
    hours = e.groupBy(
        F.expr(f"ns div {_NS_HOUR_G}").alias("cell")
    ).agg(F.count(F.lit(1)).alias("n"))
    rk = F.row_number().over(Window.orderBy(F.desc("n"), F.asc("cell")))
    peaks = (
        hours.withColumn("rk", rk)
        .where(F.col("rk") <= _PEAK_TOPK)
        .select(
            "cell",
            (F.col("cell") * _NS_HOUR_G).alias("p_start"),
            ((F.col("cell") + 1) * _NS_HOUR_G).alias("p_end"),
        )
    )
    cells = sess.select(
        "user_id",
        "s_start",
        "s_end",
        F.explode(
            F.sequence(
                F.expr(f"s_start div {_NS_HOUR_G}"),
                F.expr(f"s_end div {_NS_HOUR_G}"),
            )
        ).alias("cell"),
    )
    joined = cells.join(peaks, "cell").where(
        (F.col("s_start") < F.col("p_end"))
        & (F.col("p_start") < F.col("s_end"))
    )
    return joined.select(
        "user_id",
        F.col("s_start").alias("session_start_ns"),
        F.col("p_start").alias("peak_start_ns"),
        F.expr(
            "(least(s_end, p_end) - greatest(s_start, p_start)) div 1000000"
        ).alias("overlap_ms"),
    ).orderBy("user_id", "session_start_ns", "peak_start_ns")
