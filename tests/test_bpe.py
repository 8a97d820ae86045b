"""bpe_learn_merges (E244) differential: a straight-line python BPE
trainer (dict vocab, per-word skip-scan merges — the classic algorithm)
must agree with the distributed string-replace formulation on the real
corpus AND on adversarial repeated-character words where left-to-right
non-overlap semantics actually bite ('aaaa' -> aa,aa; 'aaa' -> aa,a)."""

from __future__ import annotations

from collections import Counter

from big_data__instagram_analysis_spark.queries.llm_text import (
    BPE_ROUNDS,
    bpe_learn_merges,
)


def _brute_bpe(words: Counter, rounds: int) -> list[tuple]:
    vocab = {w: [list(w), c] for w, c in words.items()}
    out = []
    for r in range(1, rounds + 1):
        pc: Counter = Counter()
        for syms, c in vocab.values():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        for entry in vocab.values():
            syms = entry[0]
            ns, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            entry[0] = ns
        distinct = set()
        total = 0
        for syms, c in vocab.values():
            distinct.update(syms)
            total += len(syms) * c
        out.append((r, a, b, cnt, len(distinct), total))
    return out


def _collect(df) -> list[tuple]:
    return [
        (r["round"], r["pair_a"], r["pair_b"], r["pair_count"],
         r["n_symbols"], r["total_symbols"])
        for r in df.collect()
    ]


def test_bpe_matches_python_brute_force_on_corpus(spark, sf_dir):
    words: Counter = Counter()
    for r in (
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("text").collect()
    ):
        for w in r["text"].split(" "):
            if w:
                words[w] += 1
    expected = _brute_bpe(words, BPE_ROUNDS)
    got = _collect(bpe_learn_merges(spark, sf_dir))
    assert got == expected and len(got) == BPE_ROUNDS


def test_bpe_chain_merge_semantics(spark, tmp_path):
    """Repeated-char words force the non-overlap scan: with (a,a) winning
    round 1, 'aaaa' must become aa,aa and 'aaa' must become aa,a — the
    case where a naive replace on single separators diverges from BPE."""
    docs = [
        (0, "aaaa aaaa aaaa aaa aaa baab"),
        (1, "aaaa aaa baab baab cc"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    path = str(tmp_path / "bpe")
    df.write.parquet(f"{path}/documents.parquet")
    words: Counter = Counter()
    for _, t in docs:
        for w in t.split(" "):
            if w:
                words[w] += 1
    expected = _brute_bpe(words, BPE_ROUNDS)
    got = _collect(bpe_learn_merges(spark, path))
    assert got == expected
    # round 1 must be the (a, a) merge, counted with overlaps at selection
    # time (aaaa contributes 3, aaa contributes 2, baab contributes 1)
    assert (got[0][1], got[0][2]) == ("a", "a")
    assert got[0][3] == 3 * words["aaaa"] + 2 * words["aaa"] + 1 * words["baab"]


def test_bpe_encode_matches_python(spark, sf_dir):
    """E245 differential: python learns the merges (the already-pinned
    brute trainer), tokenizes every document word by word, and compares
    every per-doc row."""
    from big_data__instagram_analysis_spark.queries.llm_text import (
        bpe_encode_corpus,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    words: Counter = Counter()
    for r in rows:
        for w in r["text"].split(" "):
            if w:
                words[w] += 1
    vocab = {w: list(w) for w in words}
    for _ in range(BPE_ROUNDS):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += words[w]
        (a, b), _c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, syms in vocab.items():
            ns, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            vocab[w] = ns
    expected = {}
    for r in rows:
        ws = [w for w in r["text"].split(" ") if w]
        if not ws:
            continue
        n_ch = sum(len(w) for w in ws)
        n_tok = sum(len(vocab[w]) for w in ws)
        expected[r["doc_id"]] = (
            len(ws), n_ch, n_tok, n_tok * 1_000_000 // n_ch
        )
    got = {
        r["doc_id"]: (r["n_words"], r["n_chars"], r["n_tokens"], r["tokens_per_char_ppm"])
        for r in bpe_encode_corpus(spark, sf_dir).collect()
    }
    assert got == expected and len(got) > 0


def test_bpe_seeded_fuzz_corpus(spark, tmp_path):
    """Seeded random corpus stressing the replace()-merge equivalence:
    words drawn from a tiny alphabet (maximizing repeated-char chains and
    merge collisions) plus unicode words (codepoint indexing parity).
    Both the per-round merge table and the final encoding must match the
    python trainer exactly."""
    import random

    from big_data__instagram_analysis_spark.queries.llm_text import (
        bpe_encode_corpus,
    )

    rng = random.Random(62346)
    alphabet = ["a", "b", "ж", "数"]
    vocab_words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
        for _ in range(25)
    ] + ["aaaa", "aaab", "baaa", "жжжж"]
    docs = []
    for i in range(30):
        docs.append(
            (i, " ".join(rng.choice(vocab_words) for _ in range(rng.randint(3, 20))))
        )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    path = str(tmp_path / "bpefuzz")
    df.write.parquet(f"{path}/documents.parquet")

    words: Counter = Counter()
    for _, t in docs:
        for w in t.split(" "):
            if w:
                words[w] += 1
    expected = _brute_bpe(words, BPE_ROUNDS)
    got = _collect(bpe_learn_merges(spark, path))
    assert got == expected

    # encode parity on the same corpus
    vocab = {w: list(w) for w in words}
    for r in range(BPE_ROUNDS):
        a, b = expected[r][1], expected[r][2]
        for w, syms in vocab.items():
            ns, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            vocab[w] = ns
    want = {}
    for i, t in docs:
        ws = [w for w in t.split(" ") if w]
        n_ch = sum(len(w) for w in ws)
        n_tok = sum(len(vocab[w]) for w in ws)
        want[i] = (len(ws), n_ch, n_tok, n_tok * 1_000_000 // n_ch)
    enc = {
        r["doc_id"]: (r["n_words"], r["n_chars"], r["n_tokens"], r["tokens_per_char_ppm"])
        for r in bpe_encode_corpus(spark, path).collect()
    }
    assert enc == want


def test_bpe_seeded_fuzz_multibyte_scripts(spark, tmp_path):
    """Adversarial unicode fuzz (VERDICT r6 #7): the double-separator
    replace() merge and all codepoint arithmetic exercised on CJK,
    combining marks (U+0301/U+0308 as standalone codepoints a merge can
    join to their base letter), Hangul, Arabic (RTL), and an astral-plane
    emoji (surrogate-pair parity between JVM strings and python str).
    Same exactness contract as the ASCII-leaning fuzz: per-round merge
    table AND final encoding must equal the python brute-force trainer."""
    import random

    from big_data__instagram_analysis_spark.queries.llm_text import (
        bpe_encode_corpus,
    )

    rng = random.Random(991237)
    alphabet = [
        "中", "文", "数",            # CJK ideographs
        "e", "́", "̈",     # base + combining acute / diaeresis
        "한", "글",                   # Hangul syllables
        "م", "ر",                    # Arabic (RTL)
        "😀",                         # astral plane (surrogate pair in UTF-16)
        "ß",                          # casing edge-case letter
    ]
    vocab_words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
        for _ in range(20)
    ] + ["中中中中", "éé", "😀😀😀", "한글한글"]
    docs = []
    for i in range(25):
        docs.append(
            (i, " ".join(rng.choice(vocab_words) for _ in range(rng.randint(3, 15))))
        )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    path = str(tmp_path / "bpemb")
    df.write.parquet(f"{path}/documents.parquet")

    words: Counter = Counter()
    for _, t in docs:
        for w in t.split(" "):
            if w:
                words[w] += 1
    expected = _brute_bpe(words, BPE_ROUNDS)
    got = _collect(bpe_learn_merges(spark, path))
    assert got == expected

    vocab = {w: list(w) for w in words}
    for r in range(BPE_ROUNDS):
        a, b = expected[r][1], expected[r][2]
        for w, syms in vocab.items():
            ns, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            vocab[w] = ns
    want = {}
    for i, t in docs:
        ws = [w for w in t.split(" ") if w]
        n_ch = sum(len(w) for w in ws)
        n_tok = sum(len(vocab[w]) for w in ws)
        want[i] = (len(ws), n_ch, n_tok, n_tok * 1_000_000 // n_ch)
    enc = {
        r["doc_id"]: (r["n_words"], r["n_chars"], r["n_tokens"], r["tokens_per_char_ppm"])
        for r in bpe_encode_corpus(spark, path).collect()
    }
    assert enc == want
