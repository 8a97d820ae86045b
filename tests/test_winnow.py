"""winnow_fingerprints (E234): the in-row HOF winnowing must match a
straight-line python brute force of the Schleimer/Wilkerson/Aiken spec —
Karp-Rabin rolling hash, w-window min with RIGHTMOST-position tiebreak,
consecutive-window dedup — on both real corpus docs and adversarial
hand-built strings (ties, short docs, repeated substrings)."""

from __future__ import annotations

from big_data__instagram_analysis_spark.queries.llm_text import (
    _WINNOW_B,
    _WINNOW_K,
    _WINNOW_M,
    _WINNOW_W,
    winnow_fingerprints,
)
from big_data__instagram_analysis_spark.registry import get_specs


def _brute_winnow(text: str, k: int, w: int, b: int, m: int) -> list[int]:
    """Reference winnowing: every k-gram Horner hash, then each window of w
    consecutive hashes keeps its min, ties broken by the RIGHTMOST position
    (the SWA-2003 robust-winnowing choice); consecutive windows that agree
    contribute one fingerprint. Short docs (< w grams) emit the global min."""
    n = len(text) - (k - 1)
    if n <= 0:
        return []
    hs = []
    for p in range(n):
        h = 0
        for ch in text[p : p + k]:
            h = (h * b + ord(ch)) % m
        hs.append(h)
    if n < w:
        best = min(range(n), key=lambda i: (hs[i], -i))
        return [hs[best]]
    fps: list[int] = []
    prev_pos = -1
    for i in range(n - w + 1):
        best = min(range(i, i + w), key=lambda j: (hs[j], -j))
        if best != prev_pos:
            fps.append(hs[best])
            prev_pos = best
    return fps


def _summarize(fps: list[int], n_grams: int) -> tuple:
    return (
        len(fps),
        sum(fps),
        min(fps),
        max(fps),
        len(fps) * 1_000_000 // n_grams,
    )


def test_winnow_matches_python_brute_force_on_corpus(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(80)
        .collect()
    }
    got = {
        r["doc_id"]: (r["n_fps"], r["fp_checksum"], r["fp_min"], r["fp_max"], r["density_ppm"])
        for r in winnow_fingerprints(spark, sf_dir).collect()
        if r["doc_id"] in docs
    }
    assert len(got) == len(docs) > 0
    for doc_id, text in docs.items():
        fps = _brute_winnow(text, _WINNOW_K, _WINNOW_W, _WINNOW_B, _WINNOW_M)
        n_grams = len(text) - (_WINNOW_K - 1)
        assert got[doc_id] == _summarize(fps, n_grams), doc_id


def test_winnow_adversarial_strings(spark, tmp_path):
    """Tie-heavy and boundary cases: all-same-char (every gram hash equal —
    pure tiebreak territory), periodic text (repeated gram hashes), a doc
    with exactly k chars (one gram, short-doc path), one with k + w - 2
    chars (n_grams = w - 1, the largest short doc), and one long random-ish
    string. The packed-key array_distinct equals the brute force's
    consecutive-position dedup because sliding-window argmin positions are
    monotonically non-decreasing under the rightmost tiebreak (a smaller
    hash left of the current argmin would contradict the previous window's
    minimality; an equal hash loses the rightmost tiebreak) — all-same-char
    text therefore keeps one fingerprint PER WINDOW, not one per value."""
    k, w, b, m = _WINNOW_K, _WINNOW_W, _WINNOW_B, _WINNOW_M
    texts = [
        "a" * 30,
        "abcabcabcabcabcabcabcabc",
        "x" * k,
        "y" * (k + w - 2),
        "The quick brown fox jumps over the lazy dog 0123456789",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "docs")
    df.write.parquet(f"{path}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_fps"], r["fp_checksum"], r["fp_min"], r["fp_max"], r["density_ppm"])
        for r in winnow_fingerprints(spark, path).collect()
    }
    for i, t in enumerate(texts):
        fps = _brute_winnow(t, k, w, b, m)
        assert got[i] == _summarize(fps, len(t) - (k - 1)), t


def test_winnow_guarantee_shared_substring_shares_fingerprint(spark, tmp_path):
    """The winnowing theorem: any shared substring of length >= k + w - 1
    produces at least one SHARED fingerprint. Plant a 24-char needle inside
    two otherwise-different carriers and check fingerprint intersection."""
    needle = "registered query surface"
    assert len(needle) >= _WINNOW_K + _WINNOW_W - 1
    a = "left padding text here // " + needle + " // and a right tail"
    c = "совершенно другой префикс " + needle + " totally different suffix!"
    df = spark.createDataFrame([(0, a), (1, c)], "doc_id long, text string")
    path = str(tmp_path / "docs2")
    df.write.parquet(f"{path}/documents.parquet")
    fps = {
        i: set(_brute_winnow(t, _WINNOW_K, _WINNOW_W, _WINNOW_B, _WINNOW_M))
        for i, t in [(0, a), (1, c)]
    }
    assert fps[0] & fps[1], "theorem violated in the reference implementation"
    got = {
        r["doc_id"]: (r["n_fps"], r["fp_checksum"])
        for r in winnow_fingerprints(spark, path).collect()
    }
    for i, t in [(0, a), (1, c)]:
        fps = _brute_winnow(t, _WINNOW_K, _WINNOW_W, _WINNOW_B, _WINNOW_M)
        assert got[i] == (len(fps), sum(fps))


def test_winnow_arrow_core_equals_hof_core(spark, tmp_path):
    """r13: the mapInArrow/NumPy winnow core must produce the identical
    per-doc (n_grams, fph MULTISET) as the zip_with HOF ladder it replaced
    — element order inside fph is the one allowed difference (ascending vs
    first-occurrence; every consumer is order-insensitive). Exercised on
    the tie/boundary/non-ASCII adversarial strings, not just the fixture
    corpus."""
    from pyspark.sql import functions as F

    from big_data__instagram_analysis_spark.queries.llm_text import (
        _winnow_selected_arrow,
        _winnow_selected_hof,
    )

    k, w = _WINNOW_K, _WINNOW_W
    texts = [
        "a" * 30,
        "abcabcabcabcabcabcabcabc",
        "x" * k,
        "y" * (k + w - 2),
        "совершенно другой префикс — non-ASCII codepoints end to end",
        "The quick brown fox jumps over the lazy dog 0123456789",
        "short",  # below k: filtered out by BOTH cores
    ]
    df = spark.createDataFrame(
        [(i, t, f"src{i % 2}") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    path = str(tmp_path / "docs_ab")
    df.write.parquet(f"{path}/documents.parquet")

    def canon(frame):
        return (
            frame.select(
                "doc_id", "source", "n_grams", F.sort_array("fph").alias("fph")
            )
            .orderBy("doc_id")
            .collect()
        )

    a = canon(_winnow_selected_hof(spark, path, extra_cols=("source",)))
    b = canon(_winnow_selected_arrow(spark, path, extra_cols=("source",)))
    assert len(a) == len(texts) - 1  # the sub-k doc is gone from both
    assert a == b


def test_winnow_plan_is_scan_shaped(spark, sf_dir):
    """No explode and no mid-plan aggregate exchange: the only exchange
    allowed is the final per-doc ORDER BY (rangepartitioning)."""
    df = get_specs()["winnow_fingerprints"].fn(spark, sf_dir)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    ).lower()
    assert "generate" not in plan, "winnowing must not explode gram rows"
    assert "hashpartitioning" not in plan, "no shuffle besides the sort"


def test_winnow_match_pairs_matches_python_brute_force(spark, sf_dir):
    """Full-pipeline differential: python recomputes per-doc DISTINCT
    fingerprint sets, the scale-relative df cull, pair shared counts and
    the integer-ppm overlap, then compares the deterministic top-50."""
    from big_data__instagram_analysis_spark.queries.llm_text import (
        winnow_match_pairs,
    )

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
        if len(r["text"]) >= _WINNOW_K
    }
    fps = {
        d: set(_brute_winnow(t, _WINNOW_K, _WINNOW_W, _WINNOW_B, _WINNOW_M))
        for d, t in docs.items()
    }
    df_count: dict[int, int] = {}
    for s in fps.values():
        for f in s:
            df_count[f] = df_count.get(f, 0) + 1
    cap = max(2, len(fps) // 50)
    rare = {d: {f for f in s if 2 <= df_count[f] <= cap} for d, s in fps.items()}
    pair_shared: dict[tuple[int, int], int] = {}
    by_fp: dict[int, list[int]] = {}
    for d, s in rare.items():
        for f in s:
            by_fp.setdefault(f, []).append(d)
    for f, ds in by_fp.items():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                pair_shared[(ds[i], ds[j])] = pair_shared.get((ds[i], ds[j]), 0) + 1
    expected = sorted(
        (
            (a, b, n, len(rare[a]), len(rare[b]),
             n * 1_000_000 // min(len(rare[a]), len(rare[b])))
            for (a, b), n in pair_shared.items()
        ),
        key=lambda r: (-r[2], r[0], r[1]),
    )[:50]
    got = [
        (r["doc_a"], r["doc_b"], r["shared_fps"], r["rare_a"], r["rare_b"], r["overlap_ppm"])
        for r in winnow_match_pairs(spark, sf_dir).collect()
    ]
    assert len(got) == len(expected) > 0
    assert got == expected


def test_ingest_gate_matches_python_brute_force(spark, sf_dir):
    """E240 full-pipeline differential: python recomputes rare fingerprint
    sets, best-reference-match scores and the per-source admission
    accounting, then compares every row."""
    from big_data__instagram_analysis_spark.queries.llm_text import (
        DSIR_TARGET_SRC,
        INGEST_GATE_SHARED,
        ingest_neardup_gate,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source", "text")
        .collect()
    )
    fps = {
        r["doc_id"]: (
            r["source"],
            set(_brute_winnow(r["text"], _WINNOW_K, _WINNOW_W, _WINNOW_B, _WINNOW_M)),
        )
        for r in rows
        if len(r["text"]) >= _WINNOW_K
    }
    dfc: dict[int, int] = {}
    for _, s in fps.values():
        for f in s:
            dfc[f] = dfc.get(f, 0) + 1
    cap = max(2, len(fps) // 50)
    rare = {d: {f for f in s if 2 <= dfc[f] <= cap} for d, (_, s) in fps.items()}
    ref_by_fp: dict[int, list[int]] = {}
    for d, (src, _) in fps.items():
        if src == DSIR_TARGET_SRC:
            for f in rare[d]:
                ref_by_fp.setdefault(f, []).append(d)
    expected: dict[str, list[int]] = {}
    for d, (src, _) in fps.items():
        if src == DSIR_TARGET_SRC:
            continue
        cnt: dict[int, int] = {}
        for f in rare[d]:
            for rd in ref_by_fp.get(f, ()):
                cnt[rd] = cnt.get(rd, 0) + 1
        expected.setdefault(src, []).append(max(cnt.values()) if cnt else 0)
    want = {
        src: (
            len(v),
            sum(1 for x in v if x >= 1),
            sum(1 for x in v if x >= INGEST_GATE_SHARED),
            max(v),
            sum(v),
        )
        for src, v in expected.items()
    }
    got = {
        r["source"]: (
            r["n_new"], r["n_ref_linked"], r["n_gated"], r["max_shared"], r["sum_shared"]
        )
        for r in ingest_neardup_gate(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 1


def test_winnow_unicode_fuzz_single_batch(spark, tmp_path):
    """Randomized congruence/overflow fuzz for the doubling ladder: 48
    seeded random strings mixing ASCII, Latin-1, Cyrillic, CJK and astral
    codepoints (ascii() yields codepoints up to 0x10FFFF — the overflow
    band the mod-staging exists for), plus repeated-tile strings that
    maximize hash ties. One DataFrame, one comparison against the python
    per-step-mod reference."""
    import random

    rng = random.Random(20260815)
    pools = [
        "abcdefgh ijklmnop",
        "äöüßéèêñçøå",
        "абвгдежзик",
        "数据处理引擎测试",
        "".join(chr(c) for c in (0x1F600, 0x1F680, 0x10400, 0x2F800)),
    ]
    texts = []
    for i in range(40):
        pool = pools[i % len(pools)] + pools[(i * 7) % len(pools)]
        texts.append("".join(rng.choice(pool) for _ in range(rng.randint(8, 120))))
    for tile in ("ab", "абв", "数", "x"):
        texts.append(tile * 30)
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "fuzz")
    df.write.parquet(f"{path}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_fps"], r["fp_checksum"], r["fp_min"], r["fp_max"])
        for r in winnow_fingerprints(spark, path).collect()
    }
    checked = 0
    for i, t in enumerate(texts):
        if len(t) < _WINNOW_K:
            assert i not in got
            continue
        fps = _brute_winnow(t, _WINNOW_K, _WINNOW_W, _WINNOW_B, _WINNOW_M)
        assert got[i] == (len(fps), sum(fps), min(fps), max(fps)), repr(t[:40])
        checked += 1
    assert checked >= 40
