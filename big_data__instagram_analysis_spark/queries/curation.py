"""Corpus-curation operators (SURVEY.md §2.12 E17-E19): the filtering /
shaping stages of a training-data pipeline that sit between raw text and
tokenized batches — corpus-frequency boilerplate detection (C4-style),
within-document repetition scoring (Gopher-style), and sequence packing.

All three stay JVM-side: tokenization and n-gramming are higher-order array
functions inside whole-stage codegen (no Python in the hot path), the
boilerplate document-frequency table is one shuffle, and packing is a
per-shard prefix sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import query

#: tokens → distinct word-3-grams, as a reusable column expression.
_TOKENS = "filter(split(text, ' '), t -> t <> '')"
_GRAMS3 = (
    f"array_distinct(transform(sequence(1, greatest(size({_TOKENS}) - 2, 0)),"
    f" i -> concat_ws(' ', slice({_TOKENS}, i, 3))))"
)


@query(
    "boilerplate_ngram_flags",
    tags=("llm_bench",),
    category="L4,E17",
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
  FROM documents
), grams AS (
  SELECT doc_id, list_distinct(list_transform(
           range(1, greatest(len(t) - 2, 0) + 1),
           i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS g
  FROM toks
), exploded AS (
  SELECT doc_id, unnest(g) AS s FROM grams
), freq AS (
  SELECT s FROM exploded GROUP BY s HAVING count(*) >= 3
), hits AS (
  SELECT e.doc_id, count(*) AS n_boilerplate
  FROM exploded e JOIN freq f ON e.s = f.s
  GROUP BY e.doc_id
)
SELECT g.doc_id,
       CAST(len(g.g) AS BIGINT) AS n_grams,
       CAST(coalesce(h.n_boilerplate, 0) AS BIGINT) AS n_boilerplate,
       round(coalesce(h.n_boilerplate, 0) * 1.0 / len(g.g), 6) AS bp_frac
FROM grams g LEFT JOIN hits h ON g.doc_id = h.doc_id
ORDER BY g.doc_id
""",
)
def boilerplate_ngram_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate detection: a 3-gram occurring in ≥ 3 distinct
    documents is corpus-boilerplate; score each doc by the fraction of its
    distinct 3-grams that are boilerplate.

    Shape: per-doc distinct n-grams (HOFs, no shuffle) → explode → one
    groupBy for the corpus document-frequency table → semi-ish join back and
    re-aggregate per doc. The n-gram DF table is the only shuffle; a hot
    n-gram ("click here to subscribe") is a skew key, which AQE's skew-join
    split absorbs. The fixture corpus has no newlines, so the unit is the
    n-gram rather than C4's line — the plan is identical (line-hash ↔
    n-gram string).
    """
    from ..operators.dedup import shingle_rows

    d = load(spark, sf_dir, "documents")
    # Codegen shingling (operators/dedup.shingle_rows) — the per-doc
    # distinct-gram ARRAY was consumed twice (explode + size), paying the
    # interpreted HOF chain per pass (~12 s at sf0.1); the row form feeds
    # the DF table, the join-back, and the per-doc sizes from ONE lineage.
    sh = shingle_rows(d, n=3)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    freq = (
        sh.groupBy("s")
        .agg(F.count(F.lit(1)).alias("nd"))
        .where(F.col("nd") >= 3)
        .select("s")
    )
    hits = (
        sh.join(freq, "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_boilerplate"))
    )
    return (
        sizes.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.coalesce("n_boilerplate", F.lit(0)).cast("long").alias("n_boilerplate"),
            F.round(
                F.coalesce("n_boilerplate", F.lit(0)) / F.col("n_grams"), 6
            ).alias("bp_frac"),
        )
        .orderBy("doc_id")
    )


@query(
    "repetition_score",
    category="L8,E18",
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
  FROM documents
), g AS (
  SELECT doc_id, list_transform(
           range(1, greatest(len(t) - 2, 0) + 1),
           i -> array_to_string(list_slice(t, i, i + 2), ' ')) AS grams
  FROM toks
)
SELECT doc_id,
       CAST(len(grams) AS BIGINT) AS total_grams,
       CAST(len(list_distinct(grams)) AS BIGINT) AS distinct_grams,
       CASE WHEN len(grams) = 0 THEN 0.0
            ELSE round(1.0 - len(list_distinct(grams)) * 1.0 / len(grams), 6)
       END AS rep_frac
FROM g
ORDER BY doc_id
""",
)
def repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition: 1 − distinct/total 3-grams.

    High rep_frac marks degenerate generation-loop text ("the the the…");
    the Gopher/MassiveText filters threshold on exactly this family of
    signals. Pure higher-order-function projection — per-row arrays, no
    explode, no shuffle, fully inside whole-stage codegen, so at 100 TB it
    runs at scan speed.
    """
    d = load(spark, sf_dir, "documents")
    grams = F.expr(
        f"transform(sequence(1, greatest(size({_TOKENS}) - 2, 0)),"
        f" i -> concat_ws(' ', slice({_TOKENS}, i, 3)))"
    )
    g = d.select("doc_id", grams.alias("grams"))
    total = F.size("grams").cast("long")
    dist = F.size(F.array_distinct("grams")).cast("long")
    return g.select(
        "doc_id",
        total.alias("total_grams"),
        dist.alias("distinct_grams"),
        F.when(total == 0, F.lit(0.0))
        .otherwise(F.round(F.lit(1.0) - dist / total, 6))
        .alias("rep_frac"),
    ).orderBy("doc_id")


@query(
    "sequence_packing",
    category="L4,E19",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, lang, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM toks
)
SELECT doc_id, lang,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST((cum - n_tokens) // 512 AS BIGINT) AS batch_id
FROM c
ORDER BY doc_id
""",
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign docs to ≤512-token training batches, greedily
    in doc_id order within each language shard.

    batch_id = exclusive-prefix-sum(tokens) div budget — the doc that crosses
    a budget boundary starts in the batch where its prefix began, which is
    the standard greedy packing. Partitioned by lang: packing is per-shard by
    construction (a global order would serialize the prefix sum through one
    partition; real pipelines pack within shards for exactly that reason), so
    the window parallelizes across shards and scales with shard count.
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
    return (
        toks.withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.expr("(cum - n_tokens) div 512").alias("batch_id"),
        )
        .orderBy("doc_id")
    )


@query(
    "curation_pipeline",
    tags=("llm_bench",),
    category="L8,E21",
    oracle="""
WITH RECURSIVE toks AS (
  SELECT doc_id, lang, n_chars, text,
         list_filter(string_split(text, ' '), t -> t <> '') AS t
  FROM documents
), q AS (
  SELECT * FROM toks
  WHERE n_chars BETWEEN 150 AND 400
    AND len(t) >= 25
    AND len(list_distinct(t)) * 1.0 / len(t) >= 0.3
), ex AS (
  SELECT min(doc_id) AS doc_id
  FROM (SELECT doc_id,
               sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h
        FROM q)
  GROUP BY h
), s AS (
  SELECT q.* FROM q JOIN ex USING (doc_id)
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(t) - 2, 0) + 1),
           i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS g
  FROM s
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), shared AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT da, db
  FROM shared
  JOIN sizes x ON da = x.doc_id
  JOIN sizes y ON db = y.doc_id
  WHERE c * 1.0 / (x.n_sh + y.n_sh - c) >= 0.5
), sym AS (
  SELECT da AS a, db AS b FROM pairs UNION SELECT db, da FROM pairs
), reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s2.b FROM reach r JOIN sym s2 ON r.b = s2.a WHERE s2.b <> r.a
), label AS (
  SELECT a AS doc_id, least(a, min(b)) AS comp FROM reach GROUP BY a
), canon AS (
  SELECT s.doc_id, s.lang, s.t
  FROM s LEFT JOIN label l ON s.doc_id = l.doc_id
  WHERE coalesce(l.comp, s.doc_id) = s.doc_id
), grams AS (
  SELECT doc_id, lang, t,
         list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                        i -> array_to_string(list_slice(t, i, i + 2), ' ')) AS g
  FROM canon
), rep AS (
  SELECT doc_id, lang, len(t) AS n_tokens
  FROM grams
  WHERE len(g) = 0 OR 1.0 - len(list_distinct(g)) * 1.0 / len(g) <= 0.05
), c AS (
  SELECT doc_id, lang, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM rep
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST((cum - n_tokens) // 512 AS BIGINT) AS batch_id
FROM c
ORDER BY doc_id
""",
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation: quality gate → exact dedup → near-dup
    clustering (connected components, canonical survivor) → repetition
    filter → per-shard sequence packing — one lazy plan, one query.

    The composition IS the point: every stage is a declared operator
    (quality_filter L8, exact_dedup_docs L1, neardup_cc_clusters E12,
    repetition_score E18, sequence_packing E19) and Catalyst fuses their
    projections/filters into each other across stage boundaries — n-gram
    shingling and normalization never materialize between stages. At 100 TB
    this runs as: one scan of documents, the dedup-hash shuffle, the shingle
    shuffle for candidate pairs (tiny: only quality survivors), the O(log n)
    CC rounds on the pair graph (tinier: only near-dup docs), and the
    per-shard packing window — each stage's shuffle keyed on progressively
    less data, the funnel shape a curation pipeline should have.
    """
    from ..operators.dedup import exact_dedup, ngram_jaccard_pairs
    from ..operators.graph import attach_components

    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    with_toks = d.withColumn("t", toks)
    q = with_toks.where(
        F.col("n_chars").between(150, 400)
        & (F.size("t") >= 25)
        & (F.size(F.array_distinct("t")) / F.size("t") >= 0.3)
    )
    survivors = exact_dedup(q, text_col="text", id_col="doc_id").select("doc_id")
    s = q.join(survivors, "doc_id")
    pairs = ngram_jaccard_pairs(s, n=3, threshold=0.5).select("doc_a", "doc_b")
    labeled = attach_components(
        s.select("doc_id"), pairs, "doc_id", src="doc_a", dst="doc_b"
    )
    canon = s.join(
        labeled.where(F.col("component") == F.col("doc_id")).select("doc_id"),
        "doc_id",
    )
    grams = F.expr(
        "transform(sequence(1, greatest(size(t) - 2, 0)),"
        " i -> concat_ws(' ', slice(t, i, 3)))"
    )
    g = canon.select("doc_id", "lang", "t", grams.alias("g"))
    rep = g.where(
        (F.size("g") == 0)
        | (F.lit(1.0) - F.size(F.array_distinct("g")) / F.size("g") <= 0.05)
    ).select("doc_id", "lang", F.size("t").cast("long").alias("n_tokens"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rep.withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.expr("(cum - n_tokens) div 512").alias("batch_id"),
        )
        .orderBy("doc_id")
    )


# --- E221: cross-document exact repeated SPANS (suffix-style dedup primitive) -


@query(
    "repeated_span_flags",
    category="L2,E221",
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
  FROM documents
), grams AS (
  SELECT doc_id, list_transform(
           range(1, greatest(len(t) - 2, 0) + 1),
           i -> array_to_string(list_slice(t, i, i + 2), ' ')) AS g
  FROM toks
), pos AS (
  SELECT doc_id,
         unnest(g) AS gram,
         unnest(range(1, len(g) + 1)) AS seq
  FROM grams
), dup AS (
  SELECT gram FROM pos GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
), flagged AS (
  SELECT p.doc_id, p.seq FROM pos p JOIN dup d ON p.gram = d.gram
), islands AS (
  SELECT doc_id, seq,
         seq - row_number() OVER (PARTITION BY doc_id ORDER BY seq) AS grp
  FROM flagged
), runs AS (
  SELECT doc_id, grp, count(*) AS len FROM islands GROUP BY doc_id, grp
), per_doc AS (
  SELECT doc_id,
         CAST(sum(len) AS BIGINT) AS n_dup_grams,
         CAST(count(*) AS BIGINT) AS n_spans,
         CAST(max(len) + 2 AS BIGINT) AS max_span_tokens
  FROM runs GROUP BY doc_id
)
SELECT g.doc_id,
       CAST(len(g.g) AS BIGINT) AS n_grams,
       coalesce(p.n_dup_grams, 0) AS n_dup_grams,
       coalesce(p.n_spans, 0) AS n_spans,
       coalesce(p.max_span_tokens, 0) AS max_span_tokens
FROM grams g LEFT JOIN per_doc p ON g.doc_id = p.doc_id
ORDER BY g.doc_id
""",
)
def repeated_span_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact repeated SPANS — the distributed form of the
    suffix-array exact-substring dedup primitive (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better": cut exact
    duplicated substrings above a length threshold, don't drop whole docs).
    boilerplate_ngram_flags (E17) counts how MANY of a doc's 3-grams are
    corpus-frequent; this finds how LONG the contiguous duplicated runs
    are — a 50-token verbatim quote is one long span, not 48 independent
    grams, and span length is what the cut-vs-keep policy thresholds on.

    Plan: positional 3-gram rows via posexplode + lead over the doc-keyed
    window (the codegen shingle_rows shape, positions kept); duplicated
    grams = one groupBy(gram) with count_distinct(doc) ≥ 2 (map-side
    partial, AQE splits hot-gram skew); a left-semi join flags each doc's
    duplicated positions; maximal runs fall out of the gaps-and-islands
    window (seq − row_number is constant within a consecutive run) and one
    groupBy. Every stage is a key-partitioned shuffle of pre-aggregated or
    per-position rows — no pair join, no O(docs²) term, so at 100 TB the
    cost is the gram-frequency shuffle, exactly like boilerplate's. A run
    of k duplicated 3-gram positions covers k+2 tokens (max_span_tokens).
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        F.col("doc_id").alias("doc"),
        F.posexplode(F.split("text", " ")).alias("p", "t"),
    ).where(F.col("t") != "")
    w = Window.partitionBy("doc").orderBy("p")
    grams = (
        toks.select(
            "doc",
            (F.row_number().over(w)).alias("seq"),
            F.concat_ws(
                " ", F.col("t"), F.lead("t", 1).over(w), F.lead("t", 2).over(w)
            ).alias("gram"),
            F.lead("t", 2).over(w).alias("_last"),
        )
        .where(F.col("_last").isNotNull())
        .drop("_last")
    )
    dup = (
        grams.groupBy("gram")
        .agg(F.count_distinct("doc").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("gram")
    )
    flagged = grams.join(dup, "gram", "left_semi").select("doc", "seq")
    w2 = Window.partitionBy("doc").orderBy("seq")
    runs = (
        flagged.select(
            "doc", (F.col("seq") - F.row_number().over(w2)).alias("grp")
        )
        .groupBy("doc", "grp")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    per_doc = runs.groupBy("doc").agg(
        F.sum("len").cast("bigint").alias("n_dup_grams"),
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        (F.max("len") + 2).cast("bigint").alias("max_span_tokens"),
    )
    totals = grams.groupBy("doc").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams")
    )
    return (
        d.select(F.col("doc_id"))
        .join(totals, F.col("doc_id") == totals["doc"], "left")
        .drop(totals["doc"])
        .join(per_doc, F.col("doc_id") == per_doc["doc"], "left")
        .drop(per_doc["doc"])
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("n_dup_grams", F.lit(0)).cast("bigint").alias("n_dup_grams"),
            F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
            F.coalesce("max_span_tokens", F.lit(0))
            .cast("bigint")
            .alias("max_span_tokens"),
        )
        .orderBy("doc_id")
    )


# --- E223: span-cut plan (the ACTION for E221's detection) --------------------


@query(
    "repeated_span_cut_plan",
    category="L2,E223",
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
  FROM documents
), grams AS (
  SELECT doc_id, list_transform(
           range(1, greatest(len(t) - 2, 0) + 1),
           i -> array_to_string(list_slice(t, i, i + 2), ' ')) AS g,
         len(t) AS n_tokens
  FROM toks
), pos AS (
  SELECT doc_id,
         unnest(g) AS gram,
         unnest(range(1, len(g) + 1)) AS seq
  FROM grams
), dup AS (
  SELECT gram FROM pos GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
), flagged AS (
  SELECT p.doc_id, p.seq FROM pos p JOIN dup d ON p.gram = d.gram
), islands AS (
  SELECT doc_id, seq,
         seq - row_number() OVER (PARTITION BY doc_id ORDER BY seq) AS grp
  FROM flagged
), runs AS (
  SELECT doc_id, min(seq) AS s, count(*) AS len FROM islands
  GROUP BY doc_id, grp HAVING count(*) >= 8
), iv AS (
  SELECT doc_id, s AS st, s + len + 1 AS en FROM runs
), marked AS (
  SELECT doc_id, st, en,
         CASE WHEN max(en) OVER (PARTITION BY doc_id ORDER BY st, en
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   >= st
              THEN 0 ELSE 1 END AS is_new
  FROM iv
), numbered AS (
  SELECT doc_id, st, en,
         sum(is_new) OVER (PARTITION BY doc_id ORDER BY st, en
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island_id
  FROM marked
), merged AS (
  SELECT doc_id, island_id, max(en) - min(st) + 1 AS cut_len
  FROM numbered GROUP BY doc_id, island_id
), per_doc AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_cut_spans,
         CAST(sum(cut_len) AS BIGINT) AS n_cut_tokens
  FROM merged GROUP BY doc_id
)
SELECT g.doc_id,
       CAST(g.n_tokens AS BIGINT) AS n_tokens,
       coalesce(p.n_cut_spans, 0) AS n_cut_spans,
       coalesce(p.n_cut_tokens, 0) AS n_cut_tokens,
       CAST(g.n_tokens AS BIGINT) - coalesce(p.n_cut_tokens, 0)
         AS n_tokens_after
FROM grams g LEFT JOIN per_doc p ON g.doc_id = p.doc_id
ORDER BY g.doc_id
""",
)
def repeated_span_cut_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUT plan for E221's detection — Lee et al.'s policy is to excise
    exact duplicated substrings above a length threshold, not drop whole
    documents. Runs of ≥ 8 consecutive cross-doc-duplicated 3-gram
    positions (≥ 10 duplicated tokens) become token intervals
    [start, start+len+1]; intervals from nearby runs can OVERLAP (two runs
    separated by one clean gram position share up to 2 covered tokens), so
    per-doc interval MERGING — the running-cummax gaps-and-islands form:
    an interval starts a new island iff its start exceeds the max end seen
    so far — is required before token accounting double-counts the
    overlap. Output per doc: tokens before, merged cut spans, tokens cut,
    tokens after. All-integer arithmetic end to end — no rounding surface
    at all.

    Scale shape: everything through the run table is E221's plan (one
    gram-frequency shuffle, no pair join); the interval merge adds one
    doc-keyed window over rows-per-doc ≈ a handful of runs. The cummax
    frame is ROWS UNBOUNDED PRECEDING — Spark's incremental frame, O(1)
    per row (§41's distinction).
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        F.col("doc_id").alias("doc"),
        F.posexplode(F.split("text", " ")).alias("p", "t"),
    ).where(F.col("t") != "")
    w = Window.partitionBy("doc").orderBy("p")
    grams = (
        toks.select(
            "doc",
            F.row_number().over(w).alias("seq"),
            F.concat_ws(
                " ", F.col("t"), F.lead("t", 1).over(w), F.lead("t", 2).over(w)
            ).alias("gram"),
            F.lead("t", 2).over(w).alias("_last"),
        )
        .where(F.col("_last").isNotNull())
        .drop("_last")
    )
    dup = (
        grams.groupBy("gram")
        .agg(F.count_distinct("doc").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("gram")
    )
    flagged = grams.join(dup, "gram", "left_semi").select("doc", "seq")
    w2 = Window.partitionBy("doc").orderBy("seq")
    runs = (
        flagged.select(
            "doc", "seq", (F.col("seq") - F.row_number().over(w2)).alias("grp")
        )
        .groupBy("doc", "grp")
        .agg(F.min("seq").alias("s"), F.count(F.lit(1)).alias("len"))
        .where(F.col("len") >= 8)
    )
    iv = runs.select(
        "doc", F.col("s").alias("st"), (F.col("s") + F.col("len") + 1).alias("en")
    )
    w3 = Window.partitionBy("doc").orderBy("st", "en")
    marked = iv.select(
        "doc",
        "st",
        "en",
        F.when(
            F.max("en").over(w3.rowsBetween(Window.unboundedPreceding, -1))
            >= F.col("st"),
            0,
        )
        .otherwise(1)
        .alias("is_new"),
    )
    numbered = marked.select(
        "doc",
        "st",
        "en",
        F.sum("is_new")
        .over(w3.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("island_id"),
    )
    merged = numbered.groupBy("doc", "island_id").agg(
        (F.max("en") - F.min("st") + 1).alias("cut_len")
    )
    per_doc = merged.groupBy("doc").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cut_spans"),
        F.sum("cut_len").cast("bigint").alias("n_cut_tokens"),
    )
    n_tok = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    totals = d.select("doc_id", n_tok.cast("bigint").alias("n_tokens"))
    return (
        totals.join(per_doc, totals["doc_id"] == per_doc["doc"], "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_cut_spans", F.lit(0)).cast("bigint").alias("n_cut_spans"),
            F.coalesce("n_cut_tokens", F.lit(0)).cast("bigint").alias("n_cut_tokens"),
            (
                F.col("n_tokens") - F.coalesce("n_cut_tokens", F.lit(0))
            ).cast("bigint").alias("n_tokens_after"),
        )
        .orderBy("doc_id")
    )
