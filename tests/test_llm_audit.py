"""Python brute-force differentials for the corpus-forensics audits
(queries/llm_audit.py) — independent of both engines' SQL, recomputed
from the parquet with plain python."""

from __future__ import annotations

import re
from collections import Counter

import pyarrow.parquet as pq

from big_data__instagram_analysis_spark.registry import get_specs

PACK_BUDGET = 512


def _docs(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    return t.to_pylist()


def _norm(text: str) -> str:
    return re.sub(r"\s+", " ", text.lower()).strip()


def test_packing_efficiency_matches_bruteforce(spark, sf_dir):
    docs = sorted(_docs(sf_dir), key=lambda d: d["doc_id"])
    batches: dict[tuple, int] = Counter()
    cum: dict[str, int] = Counter()
    for d in docs:
        toks = len([t for t in d["text"].split(" ") if t])
        start = cum[d["lang"]]
        batches[(d["lang"], start // PACK_BUDGET)] += toks
        cum[d["lang"]] += toks
    want = {}
    for lang in sorted({d["lang"] for d in docs}):
        sizes = [v for (lg, _), v in batches.items() if lg == lang]
        want[lang] = (
            len(sizes),
            sum(sizes),
            sum(max(PACK_BUDGET - s, 0) for s in sizes),
            sum(1 for s in sizes if s > PACK_BUDGET),
            sum(min(s, PACK_BUDGET) for s in sizes) * 1_000_000
            // (PACK_BUDGET * len(sizes)),
        )
    got = {
        r["lang"]: (
            r["n_batches"],
            r["total_tokens"],
            r["underfill_tokens"],
            r["overflow_batches"],
            r["fill_ppm"],
        )
        for r in get_specs()["packing_efficiency_audit"].fn(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_dup_cluster_histogram_matches_bruteforce(spark, sf_dir):
    docs = _docs(sf_dir)
    want = Counter()
    for kind, key in (
        ("exact", lambda d: _norm(d["text"])),
        ("prefix40", lambda d: _norm(d["text"])[:40]),
    ):
        sizes = Counter(key(d) for d in docs)
        for sz, n in Counter(sizes.values()).items():
            want[(kind, sz)] = n
    got = {
        (r["key_kind"], r["cluster_size"]): r["n_clusters"]
        for r in get_specs()["dup_cluster_size_histogram"].fn(spark, sf_dir).collect()
    }
    assert got == dict(want) and len(got) > 0
    # row-conservation invariant: every doc is in exactly one cluster per kind
    rows = get_specs()["dup_cluster_size_histogram"].fn(spark, sf_dir).collect()
    for kind in ("exact", "prefix40"):
        assert sum(r["n_docs"] for r in rows if r["key_kind"] == kind) == len(docs)


def test_syndication_matches_bruteforce(spark, sf_dir):
    docs = _docs(sf_dir)
    per_text: dict[str, set] = {}
    n_docs_per_text: Counter = Counter()
    for d in docs:
        k = _norm(d["text"])
        per_text.setdefault(k, set()).add(d["source"])
        n_docs_per_text[k] += 1
    hist_texts, hist_docs = Counter(), Counter()
    for k, srcs in per_text.items():
        hist_texts[len(srcs)] += 1
        hist_docs[len(srcs)] += n_docs_per_text[k]
    got = {
        r["n_sources"]: (r["n_texts"], r["n_docs"])
        for r in get_specs()["source_syndication_audit"].fn(spark, sf_dir).collect()
    }
    assert got == {k: (hist_texts[k], hist_docs[k]) for k in hist_texts}


def test_charclass_census_matches_bruteforce(spark, sf_dir):
    docs = _docs(sf_dir)
    agg: dict[str, list[int]] = {}
    for d in docs:
        t = d["text"]
        a = agg.setdefault(d["source"], [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += len(t)
        a[2] += sum(c.isdigit() and c.isascii() for c in t)
        a[3] += sum("A" <= c <= "Z" for c in t)
        a[4] += sum(not (c.isalnum() and c.isascii()) and c != " " for c in t)
    want = {
        src: (
            n,
            ch,
            dig * 1_000_000 // ch,
            up * 1_000_000 // ch,
            pu * 1_000_000 // ch,
        )
        for src, (n, ch, dig, up, pu) in agg.items()
    }
    got = {
        r["source"]: (
            r["n_docs"],
            r["total_chars"],
            r["digit_ppm"],
            r["upper_ppm"],
            r["punct_ppm"],
        )
        for r in get_specs()["charclass_census_by_source"].fn(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


# --- winnow df-cull: the absolute occupancy leg (PERF.md §45) -----------------


def test_winnow_absolute_df_cap_binds_beyond_relative(spark, tmp_path):
    """A fingerprint bucket of 102 identical docs in a 5,200-doc corpus
    survives the RELATIVE cull (102 <= 5200/50 = 104) but must be dropped
    by the ABSOLUTE cap (df > 100) — the round-7 fix that keeps pair
    fan-out O(corpus) (without it, a x10 corpus measured x482 the join
    input). A df=3 bucket must still pair."""
    from big_data__instagram_analysis_spark.registry import get_specs

    import random
    import string

    common = "commonblock shared boilerplate run of text"
    rare = "rareneedle unique shared fragment here"
    docs = [(i, common) for i in range(102)]
    docs += [(102 + j, rare) for j in range(3)]
    # fillers: seeded-random 24-char strings — the corpus is deterministic,
    # and for this fixed draw no two fillers share an 8-gram (verified by
    # the assertion below; collision odds per draw ~1e-3)
    rng = random.Random(424243)
    docs += [
        (105 + i, "".join(rng.choice(string.ascii_lowercase) for _ in range(24)))
        for i in range(5095)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    path = str(tmp_path / "winnowcap")
    df.coalesce(4).write.parquet(f"{path}/documents.parquet")

    rows = get_specs()["winnow_match_pairs"].fn(spark, path).collect()
    pair_docs = {r["doc_a"] for r in rows} | {r["doc_b"] for r in rows}
    # the load-bearing property: NOTHING from the df=102 bucket pairs
    assert not (pair_docs & set(range(102))), sorted(pair_docs)[:10]
    # the df=3 bucket still pairs, with full overlap (random fillers can
    # contribute stray shared_fps=1 pairs via 31-bit fp collisions)
    strong = [r for r in rows if r["shared_fps"] >= 2]
    assert {r["doc_a"] for r in strong} | {r["doc_b"] for r in strong} == {102, 103, 104}
    assert len(strong) == 3
    assert all(r["overlap_ppm"] == 1_000_000 for r in strong)


def test_vocab_growth_matches_bruteforce(spark, sf_dir):
    docs = _docs(sf_dir)
    agg: dict[str, tuple[int, set]] = {}
    for d in docs:
        toks = [t for t in d["text"].split(" ") if t]
        n, types = agg.setdefault(d["source"], [0, set()])
        agg[d["source"]][0] += len(toks)
        types.update(toks)
    want = {
        src: (n, len(ty), len(ty) * 1_000_000 // n) for src, (n, ty) in agg.items()
    }
    got = {
        r["source"]: (r["n_tokens"], r["n_types"], r["ttr_ppm"])
        for r in get_specs()["vocab_growth_by_source"].fn(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_length_percentiles_match_bruteforce(spark, sf_dir):
    docs = _docs(sf_dir)
    by_src: dict[str, list] = {}
    for d in docs:
        by_src.setdefault(d["source"], []).append((d["n_chars"], d["doc_id"]))
    want = {}
    for src, vals in by_src.items():
        vals.sort()
        n = len(vals)
        pick = lambda p: vals[max(1, n * p // 100) - 1][0]
        want[src] = (n, pick(10), pick(50), pick(90))
    got = {
        r["source"]: (r["n_docs"], r["p10_chars"], r["p50_chars"], r["p90_chars"])
        for r in get_specs()["length_percentiles_by_source"].fn(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0
