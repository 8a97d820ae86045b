"""Corpus-forensics audits (round 7): the measurement queries a training-data
team runs ON the pipeline's own outputs — packing efficiency, duplicate
cluster-size distribution, cross-source syndication, and character-class
census. All four are counting scans + narrow integer aggregations (no pair
joins, no UDFs), so they cost one or two small shuffles at any corpus size;
every emitted measure is exact integer (counts / ppm via integer division)
for cross-engine hash parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import query

#: whitespace tokens (house idiom, matches curation.py / llm_text.py)
_TOKENS = "filter(split(text, ' '), t -> t <> '')"
#: normalized text (house exact-dedup normalization, operators/dedup.py).
#: Whitespace class pinned explicitly on both engines (ADVICE r11): Java
#: '\s' includes \x0B, RE2 '\s' does not — the literal class below is the
#: same character set in both. Spark SQL unescapes string literals once,
#: hence the doubled backslashes in _NORM.
_NORM = "trim(regexp_replace(lower(text), '[ \\\\t\\\\r\\\\n\\\\x0B\\\\f]+', ' '))"
_NORM_SQL = "trim(regexp_replace(lower(text), '[ \\t\\r\\n\\x0B\\f]+', ' ', 'g'))"

#: packing budget — must match sequence_packing (curation.py E19)
PACK_BUDGET = 512


@query(
    "packing_efficiency_audit",
    category="W5,E19",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens
  FROM documents
), c AS (
  SELECT lang, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM toks
), batches AS (
  SELECT lang, (cum - n_tokens) // {PACK_BUDGET} AS batch_id,
         sum(n_tokens) AS tok
  FROM c GROUP BY 1, 2
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_batches,
       CAST(sum(tok) AS BIGINT) AS total_tokens,
       CAST(sum(greatest({PACK_BUDGET} - tok, 0)) AS BIGINT) AS underfill_tokens,
       CAST(sum(CASE WHEN tok > {PACK_BUDGET} THEN 1 ELSE 0 END) AS BIGINT)
         AS overflow_batches,
       CAST(sum(least(tok, {PACK_BUDGET})) * 1000000
            // ({PACK_BUDGET} * count(*)) AS BIGINT) AS fill_ppm
FROM batches
GROUP BY lang
ORDER BY lang
""",
)
def packing_efficiency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency audit over E19's greedy batch assignment: per
    language shard, how full the ≤512-token training batches actually are —
    underfilled tokens (padding waste), batches the boundary-crossing doc
    overflows, and the capped fill ratio in ppm. The metric a pipeline
    watches to decide whether to re-sort by length before packing.

    Same per-shard prefix-sum as sequence_packing (one sort-shuffle per
    lang partition), then two narrow integer groupBys — batch count per
    shard ≈ corpus_tokens/512, so the audit aggregation input is ~0.2% of
    the token-count rows. All emits are exact integers; fill_ppm uses
    integer division on both engines (Spark `div`, DuckDB `//`).
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.expr(f"size({_TOKENS})").cast("long").alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    batches = (
        toks.withColumn("cum", F.sum("n_tokens").over(w))
        .select("lang", F.expr(f"(cum - n_tokens) div {PACK_BUDGET}").alias("batch_id"), "n_tokens")
        .groupBy("lang", "batch_id")
        .agg(F.sum("n_tokens").alias("tok"))
    )
    return (
        batches.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_batches"),
            F.sum("tok").cast("bigint").alias("total_tokens"),
            F.sum(F.greatest(F.lit(PACK_BUDGET) - F.col("tok"), F.lit(0)))
            .cast("bigint")
            .alias("underfill_tokens"),
            F.sum((F.col("tok") > PACK_BUDGET).cast("long"))
            .cast("bigint")
            .alias("overflow_batches"),
            F.expr(
                f"CAST(sum(least(tok, {PACK_BUDGET})) * 1000000"
                f" div ({PACK_BUDGET} * count(*)) AS BIGINT)"
            ).alias("fill_ppm"),
        )
        .orderBy("lang")
    )


@query(
    "dup_cluster_size_histogram",
    category="P5,E243",
    oracle=f"""
WITH keys AS (
  SELECT 'exact' AS key_kind, sha256({_NORM_SQL}) AS k FROM documents
  UNION ALL
  SELECT 'prefix40', sha256(substr({_NORM_SQL}, 1, 40)) FROM documents
), clusters AS (
  SELECT key_kind, k, count(*) AS sz FROM keys GROUP BY 1, 2
)
SELECT key_kind, CAST(sz AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sz * count(*) AS BIGINT) AS n_docs
FROM clusters
GROUP BY key_kind, sz
ORDER BY key_kind, cluster_size
""",
)
def dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster SIZE DISTRIBUTION — the first corpus-forensics
    plot after any dedup run: how many clusters of size 1, 2, 3 … exist,
    under (a) the exact normalized-text key and (b) a 40-char normalized
    prefix (catches shared boilerplate openings exact hashing misses).

    Two keyed counting aggregations per key kind: hash-key groupBy (group
    size = true dup multiplicity), then a ≤max_cluster_size-row histogram
    groupBy — the second input is one row per CLUSTER, so the heavy
    shuffle is the same single sha2-key exchange exact_dedup_docs pays.
    Keys are sha2'd so the exchange carries 32-byte keys, not documents.
    """
    d = load(spark, sf_dir, "documents")
    norm = F.expr(_NORM)
    keys = d.select(
        F.lit("exact").alias("key_kind"), F.sha2(norm, 256).alias("k")
    ).unionByName(
        d.select(
            F.lit("prefix40").alias("key_kind"),
            F.sha2(F.substring(norm, 1, 40), 256).alias("k"),
        )
    )
    clusters = keys.groupBy("key_kind", "k").agg(F.count(F.lit(1)).alias("sz"))
    return (
        clusters.groupBy("key_kind", "sz")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters"))
        .select(
            "key_kind",
            F.col("sz").cast("bigint").alias("cluster_size"),
            "n_clusters",
            (F.col("sz") * F.col("n_clusters")).cast("bigint").alias("n_docs"),
        )
        .orderBy("key_kind", "cluster_size")
    )


@query(
    "source_syndication_audit",
    category="L1,E185",
    oracle=f"""
WITH h AS (
  SELECT sha256({_NORM_SQL}) AS k, source FROM documents
), per_text AS (
  SELECT k, count(DISTINCT source) AS n_sources, count(*) AS n_docs
  FROM h GROUP BY k
)
SELECT CAST(n_sources AS BIGINT) AS n_sources,
       CAST(count(*) AS BIGINT) AS n_texts,
       CAST(sum(n_docs) AS BIGINT) AS n_docs
FROM per_text
GROUP BY n_sources
ORDER BY n_sources
""",
)
def source_syndication_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source syndication: how many normalized texts appear in 1, 2,
    … distinct sources. Rows with n_sources ≥ 2 are syndicated/mirrored
    content — the duplication a per-source dedup cannot see and the reason
    production dedup keys on content, never (source, content).

    One sha2-key shuffle (count-distinct over source rides the same
    exchange), then a ≤n_sources-row histogram: identical scale shape to
    exact dedup. Emitting the full histogram (including n_sources = 1)
    keeps the audit non-vacuous at small fixtures while the ≥2 tail is
    the finding.
    """
    d = load(spark, sf_dir, "documents")
    per_text = (
        d.select(F.sha2(F.expr(_NORM), 256).alias("k"), "source")
        .groupBy("k")
        .agg(
            F.countDistinct("source").alias("n_sources"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )
    return (
        per_text.groupBy("n_sources")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_texts"),
            F.sum("n_docs").cast("bigint").alias("n_docs"),
        )
        .select(F.col("n_sources").cast("bigint").alias("n_sources"), "n_texts", "n_docs")
        .orderBy("n_sources")
    )


@query(
    "charclass_census_by_source",
    category="L6,E228",
    oracle="""
WITH m AS (
  SELECT source,
         length(text) AS n,
         length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS dig,
         length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS upp,
         length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))
           AS punct
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS total_chars,
       CAST(sum(dig) * 1000000 // sum(n) AS BIGINT) AS digit_ppm,
       CAST(sum(upp) * 1000000 // sum(n) AS BIGINT) AS upper_ppm,
       CAST(sum(punct) * 1000000 // sum(n) AS BIGINT) AS punct_ppm
FROM m
GROUP BY source
ORDER BY source
""",
)
def charclass_census_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class census per source: digit / uppercase / punctuation
    densities in ppm — the cheap fasttext-free quality signals (tables and
    code dumps are digit/punct-heavy, shouting spam is uppercase-heavy)
    that feed per-source curation decisions upstream of any model scorer.

    Class counts via length(text) − length(regexp_replace(class, '')) —
    whole-stage-codegen JVM regex, no UDF; one narrow groupBy on source.
    Densities divide SUMS (corpus-level ppm, exact integer division on
    both engines), not per-doc averages, so the emit is hash-stable.
    """
    d = load(spark, sf_dir, "documents")

    def cnt(pat: str) -> F.Column:
        return F.length("text") - F.length(F.regexp_replace("text", pat, ""))

    m = d.select(
        "source",
        F.length("text").alias("n"),
        cnt("[0-9]").alias("dig"),
        cnt("[A-Z]").alias("upp"),
        cnt("[^a-zA-Z0-9 ]").alias("punct"),
    )
    return (
        m.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n").cast("bigint").alias("total_chars"),
            F.expr("CAST(sum(dig) * 1000000 div sum(n) AS BIGINT)").alias("digit_ppm"),
            F.expr("CAST(sum(upp) * 1000000 div sum(n) AS BIGINT)").alias("upper_ppm"),
            F.expr("CAST(sum(punct) * 1000000 div sum(n) AS BIGINT)").alias(
                "punct_ppm"
            ),
        )
        .orderBy("source")
    )


@query(
    "vocab_growth_by_source",
    category="L6,E73",
    oracle="""
WITH toks AS (
  SELECT source, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT t) AS BIGINT) AS n_types,
       CAST(count(DISTINCT t) * 1000000 // count(*) AS BIGINT) AS ttr_ppm
FROM toks
GROUP BY source
ORDER BY source
""",
)
def vocab_growth_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary audit: tokens vs distinct types per source, with
    the type-token ratio in ppm. Template/machine-generated sources show
    anomalously low TTR for their volume (vocabulary saturates); scraped
    natural text keeps growing — the single cheapest generated-content
    tripwire before any model-based detector.

    One explode + a (source, token)-keyed distinct that partial-aggregates
    map-side before the only shuffle, then a per-source count: the same
    two-level distinct shape as A3's count-distinct rows, linear at any
    corpus size. All-integer emit (ppm via integer division both engines).
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.expr(_TOKENS)).alias("t")
    )
    return (
        toks.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.countDistinct("t").cast("bigint").alias("n_types"),
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            F.expr("CAST(n_types * 1000000 div n_tokens AS BIGINT)").alias("ttr_ppm"),
        )
        .orderBy("source")
    )


@query(
    "length_percentiles_by_source",
    category="A7,E229",
    oracle="""
WITH r AS (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents
)
SELECT source,
       CAST(max(n) AS BIGINT) AS n_docs,
       CAST(max(CASE WHEN rn = greatest(1, n * 10 // 100) THEN n_chars END)
            AS BIGINT) AS p10_chars,
       CAST(max(CASE WHEN rn = greatest(1, n * 50 // 100) THEN n_chars END)
            AS BIGINT) AS p50_chars,
       CAST(max(CASE WHEN rn = greatest(1, n * 90 // 100) THEN n_chars END)
            AS BIGINT) AS p90_chars
FROM r
GROUP BY source
ORDER BY source
""",
)
def length_percentiles_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source length percentiles (p10/p50/p90 of n_chars) by
    deterministic rank selection — the per-source twin of E229's
    length-drift KS statistic, giving the drift a human-readable location
    (WHERE the distribution sits, not just that it moved).

    Engine-exact by construction: the percentile is the value at integer
    rank floor(n·p/100) (min 1) under the total order (n_chars, doc_id) —
    no interpolation, so no float percentile semantics to reconcile
    between engines. One shuffle on source; within-partition sort ranks
    independently per source at any scale (same shape as E238's
    percentile cut).
    """
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    r = d.select(
        "source",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n"),
    )

    def at(p: int) -> F.Column:
        return (
            F.max(
                F.when(
                    F.col("rn") == F.greatest(F.lit(1), F.expr(f"n * {p} div 100")),
                    F.col("n_chars"),
                )
            )
            .cast("bigint")
            .alias(f"p{p}_chars")
        )

    return (
        r.groupBy("source")
        .agg(
            F.max("n").cast("bigint").alias("n_docs"),
            at(10),
            at(50),
            at(90),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# E256: Heaps-law vocabulary-growth checkpoints
# ---------------------------------------------------------------------------

#: Number of cumulative-corpus checkpoints (deciles of total tokens).
HEAPS_CKPTS = 10


@query(
    "vocab_growth_checkpoints",
    category="L4,E256",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
  FROM documents
), doclen AS (
  SELECT doc_id, len(t) AS n FROM toks
), off AS (
  SELECT doc_id,
         coalesce(sum(n) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS base
  FROM doclen
), occ AS (
  -- positions generated IN-ROW (list_transform), doc_id matched by an
  -- explicit hash join: the comma-join + LATERAL form of this CTE made
  -- DuckDB evaluate the |docs| x |docs| cross product under the lateral
  -- at the x10 tier (35+ min; the join form is sub-second).
  SELECT u.w AS w, u.g AS gidx
  FROM (
    SELECT unnest(list_transform(range(1, len(t) + 1),
                                 i -> {{'w': t[i], 'g': o.base + i}})) AS u
    FROM toks JOIN off o USING (doc_id)
  )
), firsts AS (
  SELECT w, min(gidx) AS first_idx FROM occ GROUP BY w
), total AS (
  SELECT CAST(sum(n) AS BIGINT) AS tt FROM doclen
), ck AS (
  SELECT CAST(k AS INT) AS decile, (tt * k) // {HEAPS_CKPTS} AS n_tokens
  FROM range(1, {HEAPS_CKPTS} + 1) r(k), total
)
SELECT decile,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST((SELECT count(*) FROM firsts f WHERE f.first_idx <= ck.n_tokens)
            AS BIGINT) AS n_types,
       round(ln((SELECT count(*) FROM firsts f
                 WHERE f.first_idx <= ck.n_tokens)) / ln(ck.n_tokens), 6)
         AS heaps_ratio
FROM ck
ORDER BY decile
""",
)
def vocab_growth_checkpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary-growth audit: distinct token types V(n) at the
    ten cumulative-token deciles of the corpus (ordered by doc_id), with
    the per-checkpoint ln V / ln n ratio — the empirical Heaps exponent
    proxy. This is the diagnostic that tells a data team whether a corpus
    keeps contributing NEW vocabulary as it grows (natural text: V ≈
    K·n^0.5) or has saturated/been over-deduplicated — and it is exactly
    the property PERF.md §53's natural-growth scale tier engineers into
    the fixtures.

    Distributed without a global token sort: per-doc token counts (one
    row per doc) get a cumulative-offset window, each type's FIRST global
    occurrence index is min(doc_offset + pos) — one explode + one min-agg
    — and each checkpoint's V(n) is a count over the vocabulary-sized
    firsts table. The corpus-scale relation is touched once; the window
    runs on |docs| rows, not |tokens|. Exact integers everywhere except
    the final ln-ratio (ln of exact ints, round-6, the E75 contract).
    """
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    doclen = d.select("doc_id", F.size(toks).alias("n"), toks.alias("t"))
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    off = doclen.select(
        "doc_id",
        "t",
        F.coalesce(F.sum("n").over(w), F.lit(0)).alias("base"),
    )
    occ = off.select(
        F.col("base"),
        F.posexplode("t").alias("i0", "w"),
    ).select(F.col("w"), (F.col("base") + F.col("i0") + 1).alias("gidx"))
    firsts = occ.groupBy("w").agg(F.min("gidx").alias("first_idx"))
    total = int(doclen.agg(F.sum("n")).collect()[0][0])
    cks = spark.range(1, HEAPS_CKPTS + 1).select(
        F.col("id").cast("int").alias("decile"),
        F.expr(f"({total}L * id) DIV {HEAPS_CKPTS}").alias("n_tokens"),
    )
    # V(n) per checkpoint: broadcast the 10 checkpoints against the
    # vocabulary-sized firsts table (a tiny theta-join), count per decile.
    v = (
        firsts.crossJoin(F.broadcast(cks))
        .where(F.col("first_idx") <= F.col("n_tokens"))
        .groupBy("decile", "n_tokens")
        .agg(F.count(F.lit(1)).alias("n_types"))
    )
    return v.select(
        "decile",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_types").cast("bigint").alias("n_types"),
        F.round(F.log("n_types") / F.log("n_tokens"), 6).alias("heaps_ratio"),
    ).orderBy("decile")


# ---------------------------------------------------------------------------
# E257: Shannon token diversity per source
# ---------------------------------------------------------------------------


@query(
    "token_entropy_by_source",
    category="L8,E257",
    oracle="""
WITH occ AS (
  SELECT source, unnest(list_filter(string_split(text, ' '), t -> t <> ''))
           AS w
  FROM documents
), freq AS (
  SELECT source, w, count(*) AS c FROM occ GROUP BY source, w
), agg AS (
  SELECT source,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types,
         sum(c * ln(c)) AS clnc
  FROM freq GROUP BY source
)
SELECT source, n_tokens, n_types,
       round(ln(n_tokens) - clnc / n_tokens, 4) AS entropy_nats,
       round((ln(n_tokens) - clnc / n_tokens) / ln(n_types), 4)
         AS normalized_entropy
FROM agg
ORDER BY source
""",
)
def token_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each source's token distribution (nats), plus
    the evenness-normalized variant H/ln(V): the lexical-diversity quality
    gate — a source whose entropy collapses is boilerplate/template spam
    (a handful of tokens dominate), one at ln(V) is uniform noise;
    curation thresholds both tails, and entropy drift per ingest batch is
    a standard corpus-health alarm.

    H = ln(N) − (Σ c·ln c)/N over EXACT per-(source,type) counts: one
    explode + one map-side-combinable (source,type) agg (vocabulary-sized
    result), then a per-source fold — no joins, no second corpus pass.
    The only floats are ln's of exact integers and one division, rounded
    to 4 (the E73 sums-of-logs contract: the Σ c·ln c partial-sum order
    can differ across engines by ulps, so 4 decimals is the honest
    precision — each term is identical IEEE on both sides).
    """
    d = load(spark, sf_dir, "documents")
    occ = d.select(
        "source",
        F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias("w"),
    )
    freq = occ.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    agg = freq.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(F.col("c") * F.log("c")).alias("clnc"),
    )
    h = F.log("n_tokens") - F.col("clnc") / F.col("n_tokens")
    return agg.select(
        "source",
        "n_tokens",
        "n_types",
        F.round(h, 4).alias("entropy_nats"),
        F.round(h / F.log("n_types"), 4).alias("normalized_entropy"),
    ).orderBy("source")
