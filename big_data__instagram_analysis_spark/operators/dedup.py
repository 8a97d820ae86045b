"""Deduplication operators for the LLM-data-pipeline extension
(SURVEY.md §2.10 L1/L2 + mandated dedup variants).

Cross-engine determinism: every hash that reaches checked output derives
from md5/sha2 (stable everywhere), never Spark's murmur3 ``hash()`` or
DuckDB's ``hash()`` (engine-specific).

Scale notes per operator are in each docstring; the common theme is that
candidate generation is always key-bucketed (hash group, LSH band, SimHash
band) so the pair space is per-bucket quadratic, never global quadratic.

Retention note (ADVICE r7): the shingle-sharing operators below use
``localCheckpoint(eager=False)`` frames that live in block-manager storage
until the DataFrame is garbage-collected driver-side. In a batch/bench
context (fresh session per run, or the bench tools' per-query GC) that is
the intended lifetime; a LONG-LIVED service invoking these repeatedly
should drop references promptly (storage is reclaimed via the
ContextCleaner once the frame is unreachable) and accept that checkpoint
truncation makes the stage non-recomputable on executor loss — the
standard localCheckpoint trade, chosen here because the frames are
3×-reused within one query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: 60-bit SimHash (15 hex chars of md5) — fits signed int64, and 60 = 4
#: bands × 15 bits for the banded near-dup join.
SIMHASH_BITS = 60


#: Explicit whitespace class for text normalization, pinned on BOTH engines
#: (ADVICE r11): Java regex '\s' is exactly [ \t\n\x0B\f\r] while DuckDB's
#: RE2 '\s' EXCLUDES \x0B (vertical tab), so an implicit '\s+' on the two
#: sides hashes a \x0B-bearing text differently. The same spelling below is
#: valid Java regex AND RE2, so the engine expression and the SQL-literal
#: oracle twin collapse the identical set of characters.
WS_RE = r"[ \t\r\n\x0B\f]+"
#: The RE2/SQL-literal twin (DuckDB string literals pass backslashes through).
WS_RE_SQL = WS_RE
#: Spark-SQL-expression twin: the SQL parser unescapes string literals once,
#: so backslashes must be doubled when the regex rides inside expr()/sql().
WS_RE_SPARK_SQL = WS_RE.replace("\\", "\\\\")


def normalize_text(col: F.Column) -> F.Column:
    """Canonical text form for exact dedup: lower, collapse whitespace, trim.

    Collapse runs BEFORE trimming: trim() strips only ASCII spaces, so a
    leading tab/newline would survive a trim-first order ('\\tb' → ' b' ≠
    'b' — found by the hypothesis fuzz in tests/test_dedup_properties.py).
    After the collapse every whitespace run is a single 0x20, which trim
    does strip. The whitespace class is :data:`WS_RE` — explicit, so the
    DuckDB oracle twins collapse the same characters (Java vs RE2 '\\s'
    disagree on \\x0B).
    """
    return F.trim(F.regexp_replace(F.lower(col), WS_RE, " "))


def exact_dedup(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on normalized text: sha2-group, survivor = min id.

    One shuffle on the 256-bit hash; group sizes are bounded by true
    duplicate multiplicity so no skew mitigation is needed at 100 TB.
    Returns (survivor id, content_hash, n_copies).
    """
    hashed = df.select(
        F.col(id_col),
        F.sha2(F.encode(normalize_text(F.col(text_col)), "UTF-8"), 256).alias(
            "content_hash"
        ),
    )
    w = Window.partitionBy("content_hash").orderBy(id_col)
    return (
        hashed.select(
            "content_hash",
            F.col(id_col),
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("content_hash")).alias("n_copies"),
        )
        .where(F.col("rn") == 1)
        .select(F.col(id_col), "content_hash", F.col("n_copies").cast("long"))
    )


def token_shingles(text_col: F.Column, n: int = 3) -> F.Column:
    """Distinct n-token shingles of a document as an array<string>."""
    toks = F.filter(F.split(text_col, " "), lambda t: t != "")
    shingles = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, F.lit(n))),
    )
    # Spark sequence(1, k) is DESCENDING for k < 1 — guard short docs.
    return F.when(F.size(toks) >= n, F.array_distinct(shingles)).otherwise(
        F.array().cast("array<string>")
    )


def shingle_rows(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Distinct (doc, n-token-shingle) ROWS — the fast twin of
    :func:`token_shingles`.

    token_shingles builds an in-row array via transform/concat_ws — the HOF
    chain is interpreted (not whole-stage codegen) and measured ~5 s/pass on
    sf0.1's 270k tokens. r7–r11 used a posexplode + lead-window form
    instead; r12 (guide §2.3/§2.4) replaces that with ``arrays_zip`` of n
    shifted ``slice``s + one explode: the same in-row bulk array kernels,
    but NO doc-keyed window — so no token-wide sort, and the (doc, shingle)
    dedup happens partition-locally (partial aggregate BEFORE any
    exchange). A/B at sf0.1 (tools/ab_shingle_zip_r12.py): shingle pass
    0.52 → 0.40 s, the shingle_pair_ppm consumer chain 2.20 → 1.76 s,
    identical 260,388-row output set. At 100 TB the win is structural: the
    old form shuffled EVERY token to the doc window; this form shuffles
    only map-side-deduped shingle rows (and when the scan-parallelism
    guard below repartitions, the dedup is entirely partition-local).
    Equivalence with token_shingles stays fuzz-pinned
    (tests/test_dedup_properties.py).
    """
    # Local-tier scan-parallelism guard (round 10): a bench-tier documents
    # file is smaller than one split, so the scan is ONE task and the whole
    # split+posexplode phase ran single-threaded (ABAB-measured 0.88 →
    # 0.46 s at sf0.1). Repartition ONLY when the scan produced far fewer
    # partitions than cores — at 100 TB the scan is thousands of splits and
    # this is a no-op (a corpus-wide text shuffle would be exactly wrong).
    # Keying by id keeps the exchange reusable by the doc window below.
    # Width is proportional to cores (not a hard-coded 8): on a 64-core
    # executor an 8-way repartition would still sit 4x under this guard's
    # own trigger threshold. defaultParallelism//2 keeps per-task splits
    # chunky while clearing the parts*4 < cores condition on any box.
    # Two-step probe (round 11): file count first (free — no plan
    # conversion), and only when it looks low confirm with the ACTUAL
    # split count via the RDD probe. File count alone is wrong for
    # few-LARGE-files corpora (2 files × 5 GB = ~80 byte-splits — a
    # repartition there would shuffle the whole corpus's text and CAP
    # parallelism, the exact pathology this guard disclaims), and for
    # non-file-backed frames (inputFiles()=[], e.g. createDataFrame),
    # where the RDD probe sees the true parallelize partition count.
    # ADVICE r11 refinement: many TINY files also defeat the file-count
    # pre-filter — FileSourceScan bin-packs small files (maxPartitionBytes /
    # openCostInBytes), so 64 × 100 KB files can collapse to a handful of
    # splits while file_count*4 >= cores skips the probe and caps
    # parallelism. Sample one file's length (one FS metadata call, no job):
    # only a MANY-large-files corpus may skip the RDD probe; small sampled
    # files fall through to it.
    sc = df.sparkSession.sparkContext
    files = df.inputFiles()
    must_probe = (len(files) or 1) * 4 < sc.defaultParallelism
    if not must_probe and files:
        try:
            jpath = sc._jvm.org.apache.hadoop.fs.Path(files[0])
            fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
            # Below ~4 MB/file the packer merges aggressively; probe to be
            # sure. Above it, each file is >= a split on its own and the
            # scan parallelism is >= file count — safe to skip.
            must_probe = fs.getFileStatus(jpath).getLen() < 4 * 1024 * 1024
        except Exception:  # pragma: no cover - FS oddities: pay the probe
            must_probe = True
    if must_probe and df.rdd.getNumPartitions() * 4 < sc.defaultParallelism:
        df = df.repartition(max(8, sc.defaultParallelism // 2), id_col)

    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    ln = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(toks, i + 1, ln) for i in range(n)])
    return (
        df.select(F.col(id_col), F.explode(z).alias("z"))
        .select(
            id_col,
            F.concat_ws(" ", *[F.col(f"z.{i}") for i in range(n)]).alias("s"),
        )
        .dropDuplicates([id_col, "s"])
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via a shared-shingle equi-join.

    explode(shingles) → self-join on the shingle → per-pair intersection
    count → Jaccard. The join is keyed on shingle values, so only documents
    that share at least one shingle ever meet — the 100 TB-safe candidate
    generation (a hot shingle is a skew key; AQE skew-join splits it).
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard rounded 6.
    """
    # shingle_rows: the zip-slice exploded-row shingling (equivalence
    # fuzz-pinned against token_shingles) — the HOF array form measured ~5x
    # slower at sf0.1 and this operator only needs the exploded rows.
    # Three consumers (sizes + both self-join sides) share ONE lazy
    # localCheckpoint materialization of the shingle rows instead of
    # re-running the scan+window shingling per lineage branch (ABAB
    # ~10% on the minhash twin at sf0.1; memory-and-disk storage, a
    # deliberate spill-for-recompute trade on a 3x-reused frame).
    sh = (
        shingle_rows(df, text_col=text_col, id_col=id_col, n=n)
        .select(F.col(id_col).alias("doc"), "s")
        .localCheckpoint(eager=False)
    )
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    # merge hint: BOTH sides of the shingle self-join grow with the corpus,
    # so broadcast is never the right physical choice at scale — and the
    # planner cannot be trusted to see that: the shingle frame's static
    # estimate runs ~50x under its true size (posexplode expansion is not
    # modeled; 2.1 MiB claimed for 2.6M rows at the x10 tier), and AQE can
    # only UPGRADE sort-merge to broadcast, never demote a statically
    # chosen broadcast — the x10 parity run on a default-1g driver died in
    # notEnoughMemoryToBuildAndBroadcast before this hint (round 8).
    shared = (
        a.hint("merge")
        .join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("shared") / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("shared"))
    # No broadcast hint on the sizes table: one row PER DOCUMENT grows with
    # the corpus, so a forced broadcast is a scale-killer at large doc
    # counts — AQE picks broadcast when it actually fits and a shuffle join
    # otherwise (same reasoning as ngram_containment_pairs below).
    return (
        shared.join(sa, F.col("doc_a") == F.col("sa.doc"))
        .join(sb, F.col("doc_b") == F.col("sb.doc"))
        .where(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def simhash(
    df: DataFrame, spark, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """60-bit SimHash per document from md5(token) bit votes.

    Pipeline: explode tokens (with multiplicity — repeated tokens vote
    repeatedly) → md5 hex → ONE ``conv`` packs the first 15 hex chars into
    a single 60-bit BIGINT per token → a single ``groupBy(doc)`` computes
    all 60 per-bit vote sums as 60 codegen'd integer sum-expressions
    (shiftright + %2) → weighted reassembly into one BIGINT, all exact
    integer math. ONE shuffle of one row per token; no row expansion.

    The round-1..3 implementation broadcast-joined a 60-row bit table
    (60× row expansion: ~16M rows and 16M string ``conv`` calls at sf0.1,
    measured 11.6 s); this shape computes identical votes from the packed
    long in 1.1 s — the per-bit work rides in the aggregate expressions
    instead of the row count, which is also the right shape at 100 TB
    (shuffle volume = docs × 60 longs either way, but map-side input stays
    1× the token count). Cross-engine-stable because md5 is the only hash
    involved.

    Bit addressing (pinned by the oracle and tests/test_simhash_fuzz.py):
    logical bit b = bit (b%4) of the 1-based hex char (b//4 + 1). ``conv``
    parses char 1 as MOST significant of the 15-char slice, so that char
    holds packed-long bits 56..59 — logical bit b sits at packed bit
    4*(14 - b//4) + (b%4).
    """
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.filter(F.split(F.col(text_col), " "), lambda t: t != "")).alias("t"),
    ).select(
        "doc",
        F.conv(F.substring(F.md5(F.encode("t", "UTF-8")), 1, 15), 16, 10)
        .cast("long")
        .alias("packed"),
    )

    def vote(b: int) -> F.Column:
        shift = 4 * (14 - b // 4) + (b % 4)
        return (F.shiftright(F.col("packed"), shift) % 2) * 2 - 1

    sums = toks.groupBy("doc").agg(
        *[F.sum(vote(b)).alias(f"v{b}") for b in range(SIMHASH_BITS)]
    )
    weighted = [
        F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        for b in range(SIMHASH_BITS)
    ]
    total = weighted[0]
    for w in weighted[1:]:
        total = total + w
    return sums.select(F.col("doc").alias(id_col), total.cast("long").alias("simhash"))


def simhash_neardup_pairs(
    sh: DataFrame, *, id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, with banded candidate
    generation: 60 bits → 4 bands of 15; any pair within Hamming ≤ 3 shares
    at least one identical band (pigeonhole), so the equi-join on
    (band_idx, band_value) finds exactly the same pairs as a quadratic scan
    — per-band-bucket cost instead of |N|² at scale.
    """
    n_bands = 4
    band_bits = SIMHASH_BITS // n_bands
    # shiftright with a Python-literal bit count keeps the math in exact
    # integer ops (a `/` here would detour through double and drop low bits).
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                (F.shiftright("simhash", i * band_bits) % (1 << band_bits)).alias("val"),
            )
            for i in range(n_bands)
        ]
    )
    banded = sh.select(
        F.col(id_col).alias("doc"), "simhash", F.explode(bands).alias("bb")
    ).select("doc", "simhash", F.col("bb.band").alias("band"), F.col("bb.val").alias("val"))

    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.where(hamming <= max_hamming).select(
        "doc_a", "doc_b", hamming.cast("int").alias("hamming")
    )


def ngram_containment_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT pairs: shared/|small| ≥ threshold with
    the smaller shingle set as numerator — catches quotes, excerpts and
    boilerplate wrappers that symmetric Jaccard misses (a 100-shingle doc
    fully embedded in a 10,000-shingle doc has Jaccard ≈ 0.01 but
    containment 1.0 — the CCNet/RefinedWeb-style dedup criterion).

    Same 100 TB-safe candidate generation as ngram_jaccard_pairs: the
    shared-shingle equi-join means only docs sharing a shingle ever meet;
    a hot shingle is a skew key AQE splits. Returns
    (doc_small, doc_big, containment, jaccard) — containment for the
    decision, Jaccard alongside to show what it would have missed.
    """
    # Three consumers (sizes + both self-join sides) share ONE lazy
    # localCheckpoint materialization of the shingle rows instead of
    # re-running the scan+window shingling per lineage branch (ABAB
    # ~10% on the minhash twin at sf0.1; memory-and-disk storage, a
    # deliberate spill-for-recompute trade on a 3x-reused frame).
    sh = (
        shingle_rows(df, text_col=text_col, id_col=id_col, n=n)
        .select(F.col(id_col).alias("doc"), "s")
        .localCheckpoint(eager=False)
    )
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    # merge hint: big-big self-join by construction; see ngram_jaccard_pairs
    # above for the static-underestimate/broadcast-demotion rationale (r8).
    shared = (
        a.hint("merge")
        .join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    na, nb = F.col("sa.n_sh"), F.col("sb.n_sh")
    small_n = F.least(na, nb)
    containment = F.col("shared") / small_n
    jac = F.col("shared") / (na + nb - F.col("shared"))
    # Smaller set is the contained side; equal sizes tiebreak to doc_a.
    # No broadcast hint on the sizes table: it is one row PER DOCUMENT, so
    # it grows with the corpus and cannot be a broadcast side at large doc
    # counts — AQE picks broadcast when it actually fits and a shuffle join
    # otherwise (the scale-correct default).
    small_is_a = na <= nb
    return (
        shared.join(sa, F.col("doc_a") == F.col("sa.doc"))
        .join(sb, F.col("doc_b") == F.col("sb.doc"))
        .where(containment >= threshold)
        .select(
            F.when(small_is_a, F.col("doc_a")).otherwise(F.col("doc_b")).alias("doc_small"),
            F.when(small_is_a, F.col("doc_b")).otherwise(F.col("doc_a")).alias("doc_big"),
            F.round(containment, 6).alias("containment"),
            F.round(jac, 6).alias("jaccard"),
        )
    )


def shingle_pair_ppm(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Shared-shingle candidate pairs with EXACT integer-ppm Jaccard and
    the threshold-0.5 edge flag — the shared building block of the
    dedup-governance family (source_overlap_matrix E272,
    neardup_cluster_quality E273, dedup_governance_rollup E275).

    Returns (doc_a, doc_b, jac_ppm, is_edge) with doc_a < doc_b;
    jac_ppm = |∩|·10⁶ div |∪| (multiply-then-div, no float anywhere),
    is_edge ⟺ jaccard ≥ 0.5 via the integer cross-multiplied predicate.
    Shape: one shingle-keyed SHJ (only docs sharing a shingle ever meet;
    a hot shingle is a skew key — AQE skew-join splits it, and
    ngram_jaccard_dfcap is the df-capped variant when boilerplate makes
    even that too hot), two size joins, one lazy localCheckpoint so the
    shingle frame materializes once across its three consumers.

    ``shingles`` (r12, guide §1.2): a caller that has ALREADY shingled the
    same frame (e.g. minhash_banding_recall_curve, which builds signatures
    from the identical (id, s) rows) passes its checkpointed frame here so
    the scan+shingle pass runs once, not twice. Must be (id_col, "s") rows
    with distinct-per-doc shingles — i.e. a :func:`shingle_rows` output.
    """
    if shingles is not None:
        # ADVICE r12: the escape hatch relies on a caller contract
        # (shingle_rows-shaped frame); the column part is cheap to verify.
        # Distinctness-per-doc stays documented, not scanned.
        missing = {id_col, "s"} - set(shingles.columns)
        assert not missing, (
            f"shingle_pair_ppm(shingles=...) must carry columns "
            f"({id_col!r}, 's'); missing {sorted(missing)}"
        )
        sh = shingles
    else:
        sh = shingle_rows(df, text_col=text_col, id_col=id_col, n=n).localCheckpoint(
            eager=False
        )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "s")
    b = sh.select(F.col(id_col).alias("doc_b"), "s")
    shared = (
        a.join(b.hint("shuffle_hash"), "s")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.join(
            sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("nb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.expr("shared * 1000000 div (na + nb - shared)").alias("jac_ppm"),
            (F.col("shared") * 2 >= F.col("na") + F.col("nb") - F.col("shared"))
            .alias("is_edge"),
        )
    )
