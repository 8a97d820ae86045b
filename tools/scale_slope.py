#!/usr/bin/env python
"""Scaling-slope artifact for the heaviest operators (VERDICT r6 #2).

The 100 TB claims rest on plan-shape assertions (tests/test_plans.py) and
design notes; this tool adds the missing empirical leg: wall time for the
top-10 heaviest operators at sf0.001 / sf0.01 / sf0.1 PLUS synthesized
×3 and ×10 tiers built by fixture replication (~sf0.3 / sf1), and the
fitted log-log exponent. A super-linear slope (exponent ≫ 1) is the one
100 TB risk the plan tests cannot see.

Synthesized tiers — replica k of K gets:
- documents: doc_id += k·10^7; text run through a k-seeded SUBSTITUTION
  CIPHER over [a-zA-Z0-9] (k=0 identity; spaces/punctuation fixed).
  String-equality structure is ISOMORPHIC within a replica — n_chars,
  token counts, uniq ratios, word-shingle overlap (so Jaccard/containment
  between any two docs of the same replica is IDENTICAL to the original
  pair's), repetition spans, and within-word char pairs all replicate
  exactly ×K — while cross-replica shingles are disjoint (a shared gram
  would need the cipher to map one real gram onto another), so near-dup
  candidate structure stays ×K linear instead of exploding quadratically
  the way naive row duplication would. Hash-derived values (minhash
  signatures, winnow fingerprints) are renamed, not preserved, so band
  occupancy replicates distributionally rather than exactly.
- embeddings: vec_id += k·10^7; dimensions permuted + sign-flipped by a
  k-seeded pattern (k=0 identity). Within-replica geometry is identical
  (permutation+sign-flip is an isometry); cross-replica cosines collapse
  to ~N(0, 1/64) noise, far below any near-dup threshold, so pair
  structure is ×K.
- orders / events: all id columns += k·10^7 (o_orderkey/o_custkey,
  event_id/user_id); value/ts columns untouched, so per-key group sizes
  and band occupancies replicate exactly.

Usage:
  python tools/scale_slope.py [--reps 2] [--synth 3,10] [--out SCALE_SLOPE.json]

Writes SCALE_SLOPE.json: per query, {tier: {sec, rows}} + fitted exponent
over the tiers ≥ sf0.01 (the sf0.001 point is floor-dominated — a 0.1 s
job floor swamps ~ms of data work — and is reported but excluded from the
fit; exponents are d log(t) / d log(sf)).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import statistics
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

HEAVY_QUERIES = [
    "minhash_lsh_neardup",
    "containment_neardup_pairs",
    "curation_pipeline",
    "winnow_match_pairs",
    "semantic_dedup_clusters",
    "repeated_span_cut_plan",
    "dedup_keep_best_survivors",
    "value_band_prefix_totals",
    "stream_stream_join_pairs",
    "bpe_pair_counts",
]

BASE_TIERS = {
    0.001: "/root/testdata/sf0.001",
    0.01: "/root/testdata/sf0.01",
    0.1: "/root/testdata/sf0.1",
}

ID_OFF = 10_000_000
#: every table any heavy query (or its loader) touches
SYNTH_TABLES = ("documents", "embeddings", "orders", "events")


_CIPHER_ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
)


def _cipher_table(k: int) -> dict[int, int]:
    """k-seeded substitution cipher over letters+digits (spaces/punct fixed)."""
    rng = np.random.RandomState(7919 * k + 13)
    perm = rng.permutation(len(_CIPHER_ALPHABET))
    return {
        ord(c): ord(_CIPHER_ALPHABET[perm[i]])
        for i, c in enumerate(_CIPHER_ALPHABET)
    }


def _replicate_documents(tb: pa.Table, k: int) -> pa.Table:
    # Transform only the columns the replication semantics touch; carry
    # every other column through generically so a future schema addition
    # isn't silently dropped from the synth tiers (ADVICE r7).
    table = _cipher_table(k)
    new_texts = [t.translate(table) for t in tb["text"].to_pylist()]
    cols = {}
    for name in tb.schema.names:
        if name == "doc_id":
            cols[name] = pc.add(tb["doc_id"], k * ID_OFF)
        elif name == "text":
            cols[name] = pa.array(new_texts, tb.schema.field("text").type)
        else:  # incl. n_chars: the cipher is length-preserving
            cols[name] = tb[name]
    return pa.table(cols)


def _replicate_embeddings(tb: pa.Table, k: int) -> pa.Table:
    vec_id = pc.add(tb["vec_id"], k * ID_OFF)
    embs = np.array(tb["embedding"].to_pylist(), dtype=np.float32)
    rng = np.random.RandomState(1000 + k)
    perm = rng.permutation(embs.shape[1])
    signs = rng.choice([-1.0, 1.0], size=embs.shape[1]).astype(np.float32)
    out = embs[:, perm] * signs  # isometry: within-replica geometry unchanged
    elem = tb.schema.field("embedding").type.value_type
    emb_arr = pa.array(out.tolist(), pa.list_(elem))
    return pa.table({"vec_id": vec_id, "embedding": emb_arr, "label": tb["label"]})


def _replicate_ids(tb: pa.Table, k: int, id_cols: list[str]) -> pa.Table:
    cols = {}
    for name in tb.schema.names:
        cols[name] = pc.add(tb[name], k * ID_OFF) if name in id_cols else tb[name]
    return pa.table(cols)


#: Queries whose cost depends on VOCABULARY growth, not just row count —
#: the ones VERDICT r8 task #6 flagged as mis-served by the substitution-
#: cipher tiers (disjoint per-replica vocabularies are pessimistic for
#: shuffle keys but unnatural for Heaps-law-sensitive work).
NATURAL_QUERIES = [
    "bpe_pair_counts",
    "bpe_learn_merges",
    "oov_rate_by_source",
    "winnow_match_pairs",
    "length_drift_ks",
]

#: Heaps-law exponent for the natural tier's type budget: V(n) ≈ K·n^β.
#: β=0.5 is the classic mid-range estimate for English-like corpora.
HEAPS_BETA = 0.5

#: Queries whose join build side is vocabulary-derived (VERDICT r9 #3).
#: The fixture vocabulary is 31-54 types, which made forced vocab
#: broadcasts invisible in every slope artifact — this tier makes them
#: measurable: ~3.7M distinct types in a ~34 MB corpus, sized so Spark's
#: STATIC estimate of the exploded/aggregated side (width-scaled scan
#: bytes — Generate stats don't multiply rows) exceeds the 10 MB
#: autoBroadcastJoinThreshold and an unhinted plan goes sort-merge; a
#: reintroduced F.broadcast() overrides the stats and flips the recorded
#: broadcast_on_vocab_join flag back to true.
VOCAB_INFLATED_QUERIES = [
    "tfidf_top_terms",
    "unigram_logprob_score",
    "perplexity_band_prune",
    "token_skipgram_pmi",
]

VI_DOCS = 75_000
VI_TOKS_PER_DOC = 50


def build_vocab_inflated_tier(out_dir: str, n_docs: int = VI_DOCS) -> dict:
    """Synthetic documents table: few rows, HUGE vocabulary.

    Every token is an 8-hex md5 prefix of (doc, position) — deterministic,
    incompressible (no dictionary-page shrink hiding the scan size), and
    ~unique (expected 8-hex collisions over 3.75M draws: ~1.6k), so the
    type count is ~= the token count: the exact corpus shape (vocabulary
    ~ corpus) where a vocab-table broadcast is maximally wrong.

    ``n_docs`` scales the tier (round 11: a second, quarter-size point so
    the vocab-sensitive queries get a fitted exponent IN TYPES, not just
    one wall — VERDICT r10 task #4)."""
    import hashlib

    os.makedirs(out_dir, exist_ok=True)
    doc_ids, texts, sources, langs, n_chars = [], [], [], [], []
    for i in range(n_docs):
        toks = [
            hashlib.md5(f"{i}_{k}".encode()).hexdigest()[:8]
            for k in range(VI_TOKS_PER_DOC)
        ]
        t = " ".join(toks)
        doc_ids.append(i)
        texts.append(t)
        sources.append(f"src{i % 5}")
        langs.append("en")
        n_chars.append(len(t))
    tb = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )
    pq.write_table(tb, os.path.join(out_dir, "documents.parquet"))
    n_tokens = n_docs * VI_TOKS_PER_DOC
    return {
        "n_docs": n_docs,
        "n_tokens": n_tokens,
        "approx_n_types": n_tokens,  # md5-prefix tokens; ~1.6k collisions
        "parquet_bytes": os.path.getsize(
            os.path.join(out_dir, "documents.parquet")
        ),
    }


def run_vocab_inflated(args, scratch_dir, get_specs, enable_bench_tuning, get_spark) -> None:
    """Measure VOCAB_INFLATED_QUERIES at sf0.1 vs the inflated-vocab tier
    and record, per query, the wall time AND whether any vocab join still
    broadcast in the FINAL (AQE) plan — merged into --out as
    'vocab_inflated_tier' (VERDICT r9 task #7)."""
    out_dir = scratch_dir("scale_vocab_inflated")
    out_dir_q = scratch_dir("scale_vocab_inflated_q")
    print(f"building vocab-inflated tier -> {out_dir}", flush=True)
    stats = build_vocab_inflated_tier(out_dir)
    print("tier stats:", stats, flush=True)
    print(f"building quarter vocab tier -> {out_dir_q}", flush=True)
    stats_q = build_vocab_inflated_tier(out_dir_q, n_docs=VI_DOCS // 4)
    print("quarter tier stats:", stats_q, flush=True)

    enable_bench_tuning()
    spark = get_spark("iga-scale-vocab")
    spark.sparkContext.setLogLevel("ERROR")
    specs = get_specs()
    import gc
    import re as _re

    per_query: dict[str, dict] = {}
    for q in VOCAB_INFLATED_QUERIES:
        rec: dict = {}
        for label, sf_dir in (
            ("sf0.1", BASE_TIERS[0.1]),
            ("vocab_inflated_q", out_dir_q),
            ("vocab_inflated", out_dir),
        ):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            fn = specs[q].fn
            df = fn(spark, sf_dir)
            df.toPandas()  # untimed warm pass; also finalizes the AQE plan
            final_plan = df._jdf.queryExecution().executedPlan().toString()

            def _vocab_broadcast(plan: str) -> bool:
                """True iff a BroadcastExchange BUILDS a vocab-derived
                frame (an aggregate keyed by the token/term column ALONE).
                A broadcast of a doc-bounded frame — e.g. tfidf's tf side
                under its pushed doc_id<50 filter — is the CORRECT plan
                and must not flag."""
                for m in _re.finditer(r"BroadcastExchange", plan):
                    seg = plan[m.start() : m.start() + 600]
                    km = _re.search(r"HashAggregate\(keys=\[([^\]]*)\]", seg)
                    if not km:
                        continue
                    keys = km.group(1)
                    if "doc_id" in keys:
                        continue
                    if _re.search(r"\b(term|w|wa|wb)#", keys):
                        return True
                return False
            walls, rows = [], None
            for _ in range(args.reps):
                t0 = time.perf_counter()
                pdf = fn(spark, sf_dir).toPandas()
                walls.append(time.perf_counter() - t0)
                rows = len(pdf)
            rec[label] = {
                "sec": round(min(walls), 4),
                "mean_sec": round(statistics.fmean(walls), 4),
                "reps": args.reps,
                "rows": rows,
                "broadcast_on_vocab_join": _vocab_broadcast(final_plan),
            }
        # Exponent IN TYPES between the two inflated points (VERDICT r10
        # task #4): both tiers have vocabulary ~= token count, so the type
        # ratio is the doc ratio (4x) and
        # exponent = log(t_full / t_quarter) / log(4).
        import math as _math

        tq, tf = rec["vocab_inflated_q"]["sec"], rec["vocab_inflated"]["sec"]
        rec["exponent_in_types"] = (
            round(_math.log(tf / tq) / _math.log(4), 3) if tq > 0 else None
        )
        per_query[q] = rec
        print(
            f"vocab-inflated {q:28s} sf0.1={rec['sf0.1']['sec']:7.3f}s "
            f"quarter={tq:7.3f}s inflated={tf:7.3f}s "
            f"exp_types={rec['exponent_in_types']} "
            f"bhj@inflated={rec['vocab_inflated']['broadcast_on_vocab_join']}",
            flush=True,
        )

    block = {
        "tier": stats,
        "tier_quarter": stats_q,
        "queries": per_query,
        "note": (
            "Vocab-inflated micro-tier (VERDICT r9 task #7): ~3.7M distinct "
            "md5-prefix types in 75k docs. broadcast_on_vocab_join reads the "
            "FINAL executed plan: at sf0.1 the 31-54-type vocab frame "
            "legitimately broadcasts (stats-driven); at this tier an "
            "unhinted plan must NOT broadcast a VOCAB-DERIVED build side "
            "(an agg keyed by the token column alone) — true means a "
            "stats-immune F.broadcast() regressed into a vocab join. A "
            "broadcast of a doc-bounded side (tfidf's pushed doc_id<50 tf "
            "frame) is the correct plan and does not flag "
            "(the tests/test_plans.py vocab suite pins the same contract)."
        ),
    }
    payload = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            payload = json.load(f)
    payload["vocab_inflated_tier"] = block
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    print(json.dumps({
        "metric": "scale_slope_vocab_inflated",
        "broadcast_flags": {
            q: per_query[q]["vocab_inflated"]["broadcast_on_vocab_join"]
            for q in per_query
        },
        "secs_inflated": {
            q: per_query[q]["vocab_inflated"]["sec"] for q in per_query
        },
    }))
    spark.stop()


def _natural_documents(tb: pa.Table, k: int, replace_types: dict[str, str]) -> pa.Table:
    """Replica k of the NATURAL-growth tier: shared core vocabulary +
    Heaps-style long-tail novelty (VERDICT r8 task #6).

    Two deterministic transforms per document:

    1. word-order SCRAMBLE — tokens permuted by a (k, n_tokens)-seeded
       permutation. Token MULTISET (and so vocabulary, word frequencies,
       n_chars — join of permuted split pieces is length-preserving) is
       untouched, but word n-gram / char-shingle structure diverges from
       replica 0, so replicas are NOT near-copies and pair-generating
       queries don't face a data-driven quadratic output (that hazard is
       why the cipher tiers exist; this tier serves the vocab-sensitive
       queries). Identical docs scramble identically (seed depends only
       on k and length), so exact-dup structure replicates.
    2. long-tail novelty — the types in ``replace_types`` (chosen
       rare-first to a Heaps budget, see build_natural_tier) are rewritten
       through the k-seeded per-word substitution cipher: each replaced
       TYPE contributes exactly one NEW type of the same length and corpus
       frequency, the way real corpus growth adds rare types.
    """
    texts = tb["text"].to_pylist()
    out_texts = []
    for t in texts:
        pieces = t.split(" ")
        rng = np.random.RandomState(10007 * k + len(pieces))
        perm = rng.permutation(len(pieces))
        out_texts.append(
            " ".join(replace_types.get(pieces[i], pieces[i]) for i in perm)
        )
    cols = {}
    for name in tb.schema.names:
        if name == "doc_id":
            cols[name] = pc.add(tb["doc_id"], k * ID_OFF)
        elif name == "text":
            cols[name] = pa.array(out_texts, tb.schema.field("text").type)
        else:  # n_chars etc.: scramble+same-length cipher are length-preserving
            cols[name] = tb[name]
    return pa.table(cols)


def build_natural_tier(mult: int, base_dir: str, out_dir: str) -> dict:
    """×mult tier with ORGANIC vocabulary growth: replicas share the core
    vocabulary and add Heaps-law long-tail novelty, instead of the
    substitution-cipher tiers' disjoint per-replica vocabularies.

    Type budget: replica k must bring the cumulative type count to
    V0·(k+1)^β (β=0.5), so it introduces T_k = V0·((k+1)^β − k^β) new
    types — chosen RARE-FIRST (count asc, then a k-salted md5 tie-break)
    because real corpus growth adds rare types, then renamed through the
    k-seeded same-length cipher. Non-document tables reuse the cipher
    tier's replication (id offsets / isometries) purely so loaders and
    multi-table queries keep working. Returns measured vocab stats so the
    artifact can show how close the tier landed to the Heaps target.
    """
    import hashlib as _hashlib

    marker = os.path.join(out_dir, "_SPARK_GRAFT_READY")
    stats_path = os.path.join(out_dir, "_VOCAB_STATS.json")
    if os.path.exists(marker) and os.path.exists(stats_path):
        with open(stats_path) as fh:
            return json.load(fh)
    os.makedirs(out_dir, exist_ok=True)

    tb = pq.read_table(os.path.join(base_dir, "documents.parquet"))
    from collections import Counter

    counts: Counter[str] = Counter()
    for t in tb["text"].to_pylist():
        counts.update(w for w in t.split(" ") if w)
    v0 = len(counts)

    reps = [tb]
    vocab_all = set(counts)
    new_types_per_replica = []
    for k in range(1, mult):
        budget = round(v0 * ((k + 1) ** HEAPS_BETA - k**HEAPS_BETA))
        ordered = sorted(
            counts.items(),
            key=lambda it: (
                it[1],
                _hashlib.md5(f"{it[0]}|{k}".encode()).hexdigest(),
            ),
        )
        cipher = _cipher_table(k)
        replace: dict[str, str] = {}
        for w, _ in ordered:
            if len(replace) >= budget:
                break
            nw = w.translate(cipher)
            if nw != w:  # all-punctuation words cipher to themselves: skip
                replace[w] = nw
        rep = _natural_documents(tb, k, replace)
        reps.append(rep)
        vocab_all.update(replace.values())
        new_types_per_replica.append(len(replace))
    big = pa.concat_tables(reps, promote_options="none")
    pq.write_table(
        big, os.path.join(out_dir, "documents.parquet"), store_schema=True
    )

    for t in SYNTH_TABLES:
        if t == "documents":
            continue
        src = pq.read_table(os.path.join(base_dir, f"{t}.parquet"))
        parts = []
        for k in range(mult):
            if k == 0:
                parts.append(src)
            elif t == "embeddings":
                parts.append(_replicate_embeddings(src, k))
            elif t == "orders":
                parts.append(_replicate_ids(src, k, ["o_orderkey", "o_custkey"]))
            elif t == "events":
                parts.append(_replicate_ids(src, k, ["event_id", "user_id"]))
        pq.write_table(
            pa.concat_tables(parts, promote_options="none"),
            os.path.join(out_dir, f"{t}.parquet"),
            store_schema=True,
        )
    for t in ("region", "nation", "customer", "supplier", "part", "lineitem"):
        src = os.path.join(base_dir, f"{t}.parquet")
        if os.path.exists(src):
            pq.write_table(pq.read_table(src), os.path.join(out_dir, f"{t}.parquet"))

    stats = {
        "v0_types": v0,
        "vocab_types_after": len(vocab_all),
        "vocab_ratio": round(len(vocab_all) / v0, 4),
        "heaps_target_ratio": round(mult**HEAPS_BETA, 4),
        "new_types_per_replica": new_types_per_replica,
        "beta": HEAPS_BETA,
    }
    with open(stats_path, "w") as fh:
        json.dump(stats, fh)
    with open(marker, "w") as fh:
        fh.write("ok")
    return stats


#: The exact pair/dedup family (VERDICT r11 task #3): the "linear candidate
#: volume" claims need TWO size points a decade apart, not one.
PAIR_QUERIES = [
    "minhash_lsh_neardup",
    "ngram_jaccard_dfcap",
    "source_overlap_matrix",
    "repeated_span_flags",
]

#: Boilerplate pool for the df-binding tier: 50 distinct 10-token
#: sentences. Each appended sentence contributes 8 3-gram shingles whose
#: document frequency grows LINEARLY with the tier multiplier (the cipher
#: replicas share them un-ciphered), so the E274 df cap (16) binds hard —
#: at x10 each boilerplate shingle has df ~200, at x30 ~600 — while the
#: non-boilerplate structure stays the cipher tier's linear shape.
BOILER_SENTENCES = 50


def _boiler_sentence(j: int) -> str:
    return (
        f"bp{j} all rights reserved unauthorized reproduction strictly "
        "prohibited contact legal"
    )


def build_pair_tier(
    mult: int, base_dir: str, out_dir: str, *, boiler: bool
) -> dict:
    """×mult documents tier for the pair family.

    boiler=False: plain cipher replication (linear candidate structure,
    disjoint cross-replica shingles) — the two-point-exponent tier.
    boiler=True: same, plus docs with orig_id%5==0 get boilerplate sentence
    (orig_id//5)%50 appended UN-ciphered in every replica, so those
    shingles' df grows ∝ mult and the dfcap path must drop them to keep
    candidate volume linear. Only `documents` is replicated (the pair
    family reads nothing else); the other tables are copied from base so
    loaders keep working. Returns tier stats (df of the hottest shingle
    is measured by the caller with DuckDB — exact, engine-independent).
    """
    marker = os.path.join(out_dir, "_SPARK_GRAFT_READY")
    if os.path.exists(marker):
        return {"cached": True}
    os.makedirs(out_dir, exist_ok=True)
    tb = pq.read_table(os.path.join(base_dir, "documents.parquet"))
    reps = []
    for k in range(mult):
        rep = tb if k == 0 else _replicate_documents(tb, k)
        if boiler:
            ids = rep["doc_id"].to_pylist()
            texts = rep["text"].to_pylist()
            new_texts = []
            for i, t in zip(ids, texts):
                orig = i % ID_OFF
                if orig % 5 == 0:
                    t = t + " " + _boiler_sentence((orig // 5) % BOILER_SENTENCES)
                new_texts.append(t)
            cols = {}
            for name in rep.schema.names:
                if name == "text":
                    cols[name] = pa.array(new_texts, rep.schema.field("text").type)
                elif name == "n_chars":
                    cols[name] = pa.array(
                        [len(t) for t in new_texts], rep.schema.field("n_chars").type
                    )
                else:
                    cols[name] = rep[name]
            rep = pa.table(cols)
        reps.append(rep)
    pq.write_table(
        pa.concat_tables(reps, promote_options="none"),
        os.path.join(out_dir, "documents.parquet"),
        store_schema=True,
    )
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ):
        src = os.path.join(base_dir, f"{t}.parquet")
        if os.path.exists(src):
            pq.write_table(pq.read_table(src), os.path.join(out_dir, f"{t}.parquet"))
    with open(marker, "w") as fh:
        fh.write("ok")
    return {"mult": mult, "boiler": boiler}


def _shingle_df_stats(doc_path: str) -> dict:
    """Exact 3-gram-shingle document-frequency stats via DuckDB (the E274
    oracle's own shingling), so 'the cap binds' is a measured claim."""
    import duckdb

    con = duckdb.connect()
    row = con.execute(
        f"""
        WITH w AS (
          SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
          FROM '{doc_path}'
        ), sh AS (
          SELECT DISTINCT doc_id,
                 unnest(list_transform(range(1, len(t) - 1),
                        i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
          FROM w WHERE len(t) >= 3
        ), df AS (SELECT s, count(*) AS df FROM sh GROUP BY s)
        SELECT max(df) AS max_df,
               count(*) AS n_shingle_types,
               sum(CASE WHEN df > 16 THEN 1 ELSE 0 END) AS types_over_cap,
               sum(CASE WHEN df > 16 THEN df ELSE 0 END) AS rows_dropped_by_cap
        FROM df
        """
    ).fetchone()
    return {
        "max_df": row[0],
        "n_shingle_types": row[1],
        "types_over_cap_16": row[2],
        "shingle_rows_dropped_by_cap": row[3],
    }


def run_pair_family(args, scratch_dir, get_specs, enable_bench_tuning, get_spark) -> None:
    """VERDICT r11 task #3: two pair-family size points a decade apart.

    Plain cipher tiers at x10 and x{mult}: two-point exponents for the four
    PAIR_QUERIES (the x10 point is re-measured IN THIS SESSION, not read
    from an old artifact — drift-immune, the bench.py §52 lesson). Boiler
    tiers at the same sizes: df of the hottest shingle grows ∝ mult and
    ngram_jaccard_dfcap must stay ~linear because the cap drops those
    shingles pre-pairing; minhash_lsh_neardup must stay ~linear because
    banding keeps hot-shingle docs from forming full-band collisions.
    Merges a 'pair_family_tier' block into --out.
    """
    mult = args.pair_family
    dirs = {}
    for label, m, boiler in (
        ("plain_x10", 10, False),
        (f"plain_x{mult}", mult, False),
        ("boiler_x10", 10, True),
        (f"boiler_x{mult}", mult, True),
    ):
        d = scratch_dir(f"scale_pair_{label}")
        print(f"building pair tier {label} -> {d}", flush=True)
        build_pair_tier(m, BASE_TIERS[0.1], d, boiler=boiler)
        dirs[label] = d

    df_stats = {
        label: _shingle_df_stats(os.path.join(d, "documents.parquet"))
        for label, d in dirs.items()
        if label.startswith("boiler")
    }
    for label, st in df_stats.items():
        print(f"df stats {label}: {st}", flush=True)

    enable_bench_tuning()
    spark = get_spark("iga-scale-pair")
    spark.sparkContext.setLogLevel("ERROR")
    specs = get_specs()
    import gc

    def _measure(q: str, sf_dir: str) -> dict:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        fn = specs[q].fn
        fn(spark, sf_dir).toPandas()  # untimed warm pass
        walls, rows = [], None
        for _ in range(args.reps):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            pdf = fn(spark, sf_dir).toPandas()
            walls.append(time.perf_counter() - t0)
            rows = len(pdf)
        return {
            "sec": round(min(walls), 4),
            "mean_sec": round(statistics.fmean(walls), 4),
            "reps": args.reps,
            "rows": rows,
        }

    per_query: dict[str, dict] = {}
    for q in PAIR_QUERIES:
        rec: dict = {}
        for label in ("plain_x10", f"plain_x{mult}"):
            rec[label] = _measure(q, dirs[label])
            print(
                f"pair {q:26s} {label:12s} {rec[label]['sec']:8.3f}s "
                f"rows={rec[label]['rows']}",
                flush=True,
            )
        t10, tm = rec["plain_x10"]["sec"], rec[f"plain_x{mult}"]["sec"]
        rec["exponent_x10_to_x%d" % mult] = (
            round(math.log(tm / t10) / math.log(mult / 10), 3) if t10 > 0 else None
        )
        per_query[q] = rec

    # df-binding leg: only the paths that CLAIM to survive boilerplate.
    # minhash_lsh_neardup (uncapped) was measured here once in round 12 and
    # DOES NOT survive: 109.7 s at boiler_x10 (vs 7.8 s plain — the shared
    # suffix dominates per-table minima, band buckets collapse into
    # boilerplate super-buckets, candidate volume goes quadratic in the
    # cohort) and the boiler_x30 pass was aborted after >30 min. That
    # measurement motivated minhash_lsh_dfcap (E277), which caps the
    # shingle space BEFORE signatures and is the variant this leg pins.
    boiler_queries = ["ngram_jaccard_dfcap", "minhash_lsh_dfcap"]
    boiler_block: dict[str, dict] = {}
    for q in boiler_queries:
        rec = {}
        for label in ("boiler_x10", f"boiler_x{mult}"):
            rec[label] = _measure(q, dirs[label])
            print(
                f"boiler {q:26s} {label:12s} {rec[label]['sec']:8.3f}s "
                f"rows={rec[label]['rows']}",
                flush=True,
            )
        t10, tm = rec["boiler_x10"]["sec"], rec[f"boiler_x{mult}"]["sec"]
        rec["exponent_x10_to_x%d" % mult] = (
            round(math.log(tm / t10) / math.log(mult / 10), 3) if t10 > 0 else None
        )
        boiler_block[q] = rec

    block = {
        "mult": mult,
        "plain_exponents": {
            q: per_query[q]["exponent_x10_to_x%d" % mult] for q in per_query
        },
        "boiler_exponents": {
            q: boiler_block[q]["exponent_x10_to_x%d" % mult] for q in boiler_block
        },
        "boiler_df_stats": df_stats,
        "queries": per_query,
        "boiler_queries": boiler_block,
        "note": (
            "Pair-family second decade (VERDICT r11 task #3): plain cipher "
            "tiers x10/x%d give two-point wall exponents in rows; boiler "
            "tiers append 50 shared un-ciphered 10-token sentences to 20%% "
            "of docs so boilerplate-shingle df grows linearly with the "
            "multiplier (measured in boiler_df_stats) — ngram_jaccard_dfcap "
            "must shed them at the df>16 cap and minhash_lsh_neardup must "
            "shed them in banding; a superlinear boiler exponent means the "
            "linear-candidate claim fails exactly where boilerplate makes "
            "pair joins hot." % mult
        ),
    }
    payload = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            payload = json.load(f)
    payload["pair_family_tier"] = block
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    print(json.dumps({
        "metric": "scale_slope_pair_family",
        "plain_exponents": block["plain_exponents"],
        "boiler_exponents": block["boiler_exponents"],
        "boiler_max_df": {k: v["max_df"] for k, v in df_stats.items()},
    }))
    spark.stop()


def build_synth_tier(mult: int, base_dir: str, out_dir: str) -> None:
    marker = os.path.join(out_dir, "_SPARK_GRAFT_READY")
    if os.path.exists(marker):
        return
    os.makedirs(out_dir, exist_ok=True)
    for t in SYNTH_TABLES:
        tb = pq.read_table(os.path.join(base_dir, f"{t}.parquet"))
        reps = []
        for k in range(mult):
            if k == 0:
                reps.append(tb)
            elif t == "documents":
                reps.append(_replicate_documents(tb, k))
            elif t == "embeddings":
                reps.append(_replicate_embeddings(tb, k))
            elif t == "orders":
                reps.append(_replicate_ids(tb, k, ["o_orderkey", "o_custkey"]))
            elif t == "events":
                reps.append(_replicate_ids(tb, k, ["event_id", "user_id"]))
        big = pa.concat_tables(reps, promote_options="none")
        pq.write_table(big, os.path.join(out_dir, f"{t}.parquet"), store_schema=True)
    # queries here never read the small dims, but io.load resolves paths
    # lazily so nothing else is needed; still, copy the tiny tables so a
    # future heavy query that joins a dim doesn't silently break the tool
    for t in ("region", "nation", "customer", "supplier", "part", "lineitem"):
        src = os.path.join(base_dir, f"{t}.parquet")
        if os.path.exists(src):
            pq.write_table(pq.read_table(src), os.path.join(out_dir, f"{t}.parquet"))
    with open(marker, "w") as fh:
        fh.write("ok")


def fit_exponent(points: list[tuple[float, float]]) -> float | None:
    """OLS slope of log(sec) on log(sf) over the given (sf, sec) points."""
    pts = [(sf, s) for sf, s in points if s > 0]
    if len(pts) < 2:
        return None
    xs = [math.log(sf) for sf, _ in pts]
    ys = [math.log(s) for _, s in pts]
    n = len(pts)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    return round(sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom, 3)


def run_natural(args, scratch_dir, get_specs, enable_bench_tuning, get_spark) -> None:
    """Measure the vocab-sensitive queries at sf0.1 vs the natural-growth
    ×N tier, both in THIS session with the same per-query GC hygiene, and
    merge a 'natural_tier' block into the artifact. Both endpoints are
    measured in one run so the adjacent exponent is drift-immune (the
    bench.py §52 lesson)."""
    mult = args.natural
    out_dir = scratch_dir(f"scale_natural_x{mult}")
    print(f"building natural tier x{mult} -> {out_dir}", flush=True)
    vocab_stats = build_natural_tier(mult, BASE_TIERS[0.1], out_dir)
    print("vocab stats:", vocab_stats, flush=True)

    enable_bench_tuning()
    spark = get_spark("iga-scale-natural")
    spark.sparkContext.setLogLevel("ERROR")
    specs = get_specs()
    import gc

    per_query: dict[str, dict] = {}
    for q in NATURAL_QUERIES:
        rec: dict = {}
        for label, sf_dir in (("sf0.1", BASE_TIERS[0.1]), (f"x{mult}_natural", out_dir)):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            fn = specs[q].fn
            fn(spark, sf_dir).toPandas()  # untimed warm pass
            walls, rows = [], None
            for _ in range(args.reps):
                t0 = time.perf_counter()
                pdf = fn(spark, sf_dir).toPandas()
                walls.append(time.perf_counter() - t0)
                rows = len(pdf)
            rec[label] = {
                "sec": round(min(walls), 4),
                "mean_sec": round(statistics.fmean(walls), 4),
                "stdev_sec": round(statistics.stdev(walls), 4)
                if len(walls) > 1
                else 0.0,
                "reps": args.reps,
                "rows": rows,
            }
        a, b = rec["sf0.1"]["sec"], rec[f"x{mult}_natural"]["sec"]
        rec["exponent_vs_sf0.1"] = (
            round(math.log(b / a) / math.log(mult), 3) if a > 0 and b > 0 else None
        )
        per_query[q] = rec
        print(
            f"natural x{mult} {q:28s} sf0.1={a:7.3f}s x{mult}={b:7.3f}s "
            f"exp={rec['exponent_vs_sf0.1']}",
            flush=True,
        )

    block = {
        "mult": mult,
        "vocab": vocab_stats,
        "queries": per_query,
        "note": (
            "Natural-growth tier (VERDICT r8 task #6): replicas share the "
            "core vocabulary, word order is scrambled per replica (token "
            "multiset preserved; replicas are NOT near-copies, so "
            "pair-generating output stays linear), and rare types are "
            "renamed to NEW same-length types to a Heaps V(n)=V0*n^0.5 "
            "budget — organic vocabulary growth, vs the cipher tiers' "
            "disjoint vocabularies. exponent_vs_sf0.1 = "
            "log(t_nat/t_sf0.1)/log(mult), both endpoints measured in one "
            "session (drift-immune)."
        ),
    }
    payload = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            payload = json.load(f)
    payload["natural_tier"] = block
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    print(json.dumps({
        "metric": "scale_slope_natural",
        "exponents": {q: per_query[q]["exponent_vs_sf0.1"] for q in per_query},
        "vocab_ratio": vocab_stats["vocab_ratio"],
        "heaps_target": vocab_stats["heaps_target_ratio"],
    }))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--synth", default="3,10", help="comma list of sf0.1 multipliers; '' disables")
    ap.add_argument("--out", default=os.path.join(REPO_ROOT, "SCALE_SLOPE.json"))
    ap.add_argument("--queries", default=",".join(HEAVY_QUERIES))
    ap.add_argument("--merge", action="store_true",
                    help="update only the measured queries inside an existing --out")
    ap.add_argument("--natural", type=int, default=0,
                    help="run ONLY the natural-growth tier pass: build a "
                    "×N tier with shared core vocabulary + Heaps long-tail "
                    "novelty and measure NATURAL_QUERIES at sf0.1 vs it, "
                    "merging a 'natural_tier' block into --out (VERDICT r8 "
                    "task #6)")
    ap.add_argument("--pair-family", type=int, default=0,
                    help="run ONLY the pair-family second-decade pass: "
                    "plain cipher tiers at x10/xN for two-point exponents "
                    "on PAIR_QUERIES, plus boilerplate tiers whose shingle "
                    "df grows with the multiplier to prove the df-cap and "
                    "banding keep candidate volume linear; merges a "
                    "'pair_family_tier' block into --out (VERDICT r11 #3)")
    ap.add_argument("--vocab-inflated", action="store_true",
                    help="run ONLY the vocab-inflated tier pass: build a "
                    "~3.7M-type micro-corpus and measure the vocab-join "
                    "queries at sf0.1 vs it, recording wall + whether any "
                    "vocab join still broadcasts in the final plan; merges "
                    "a 'vocab_inflated_tier' block into --out (VERDICT r9 "
                    "task #7)")
    args = ap.parse_args()

    from big_data__instagram_analysis_spark.io import scratch_dir
    from big_data__instagram_analysis_spark.registry import get_specs
    from big_data__instagram_analysis_spark.session import enable_bench_tuning, get_spark

    if args.natural:
        run_natural(args, scratch_dir, get_specs, enable_bench_tuning, get_spark)
        return
    if args.pair_family:
        run_pair_family(
            args, scratch_dir, get_specs, enable_bench_tuning, get_spark
        )
        return
    if args.vocab_inflated:
        run_vocab_inflated(
            args, scratch_dir, get_specs, enable_bench_tuning, get_spark
        )
        return

    tiers = dict(BASE_TIERS)
    mults = [int(m) for m in args.synth.split(",") if m.strip()]
    for m in mults:
        out_dir = scratch_dir(f"scale_synth_x{m}")
        print(f"building synth tier x{m} -> {out_dir}", flush=True)
        build_synth_tier(m, BASE_TIERS[0.1], out_dir)
        tiers[round(0.1 * m, 3)] = out_dir

    enable_bench_tuning()
    spark = get_spark("iga-scale-slope")
    spark.sparkContext.setLogLevel("ERROR")
    specs = get_specs()
    names = [q.strip() for q in args.queries.split(",") if q.strip()]

    import gc

    results: dict[str, dict] = {q: {"tiers": {}} for q in names}
    for sf in sorted(tiers):
        sf_dir = tiers[sf]
        for q in names:
            # Free accumulated localCheckpoint blocks before EVERY query:
            # the ContextCleaner only releases them after driver-side GC
            # (periodic JVM GC defaults to 30 min), and retained shingle
            # materializations from preceding queries measurably pollute
            # big-tier timings (value_band ×10 read 20.6 s mid-run vs
            # 5.4 s isolated; minhash ×10 swung 13 → 23 s across runs)
            # — per-query GC makes tier rows independent measurements.
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            fn = specs[q].fn
            fn(spark, sf_dir).toPandas()  # untimed warm pass
            walls, rows = [], None
            for _ in range(args.reps):
                # Time construction + execution together: streaming queries
                # materialize their memory sink INSIDE fn() (the harness
                # runs availableNow to completion), so timing only
                # toPandas() would measure a sink read, not the operator.
                t0 = time.perf_counter()
                pdf = fn(spark, sf_dir).toPandas()
                walls.append(time.perf_counter() - t0)
                rows = len(pdf)
            results[q]["tiers"][str(sf)] = {
                "sec": round(min(walls), 4),
                "mean_sec": round(statistics.fmean(walls), 4),
                "stdev_sec": round(statistics.stdev(walls), 4)
                if len(walls) > 1
                else 0.0,
                "reps": args.reps,
                "rows": rows,
            }
            print(
                f"sf={sf:<6} {q:32s} {min(walls):8.3f}s "
                f"(±{results[q]['tiers'][str(sf)]['stdev_sec']:.3f}) rows={rows}",
                flush=True,
            )

    for q in names:
        pts = [
            (float(sf), v["sec"])
            for sf, v in results[q]["tiers"].items()
            if float(sf) >= 0.01
        ]
        results[q]["exponent_fit_ge_0.01"] = fit_exponent(pts)
        adj = sorted(pts)
        results[q]["exponent_adjacent"] = {
            f"{a[0]}->{b[0]}": round(math.log(b[1] / a[1]) / math.log(b[0] / a[0]), 3)
            for a, b in zip(adj, adj[1:])
            if a[1] > 0 and b[1] > 0
        }

    payload = {
        "metric": "scale_slope",
        "tiers": {str(k): v for k, v in sorted(tiers.items())},
        "reps": args.reps,
        "queries": results,
        "note": (
            "exponent = OLS d log(sec)/d log(sf) over tiers >= sf0.01; the "
            "sf0.001 point is job-floor-dominated and excluded from the fit. "
            "Synth tiers replicate sf0.1 with multiset-preserving token "
            "permutation (docs), isometric dim permutation (embeddings), and "
            "id offsets (orders/events) — see module docstring for caveats."
        ),
    }
    if args.merge and os.path.exists(args.out):
        with open(args.out) as f:
            prior = json.load(f)
        prior.setdefault("queries", {}).update(payload["queries"])
        # ADVICE r8: UNION the tier maps (a filtered --merge run used to
        # replace the top-level map with only its own tiers, losing the
        # provenance of the unmeasured queries' tier rows)...
        prior.setdefault("tiers", {}).update(payload["tiers"])
        prior.setdefault("reps_by_query", {}).update(
            {q: args.reps for q in names}
        )
        # ...and null the top-level reps when per-query reps diverge — the
        # per-query records carry the authoritative value.
        if any(r != args.reps for r in prior["reps_by_query"].values()):
            prior["reps"] = None
        payload = prior
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    print(json.dumps({
        "metric": "scale_slope",
        "exponents": {q: results[q]["exponent_fit_ge_0.01"] for q in names},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
