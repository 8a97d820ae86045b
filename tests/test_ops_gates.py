"""Differential + property tests for the operational-gate operators
(E255, E258-E261): tokenizer economics vs a pure-python re count, n-gram
novelty vs a python shingle reference, exact quantile selection vs a
python sorted list, stupid-backoff surprisal vs a Counter-based reference,
and consistent hashing vs a python ring walk (plus the minimal-movement
property the operator exists to certify)."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

from big_data__instagram_analysis_spark.queries.ops_gates import (
    CH_NEW,
    CH_SHARDS,
    MEMORIZED_PPM,
    NOVELTY_W,
    QSEL_PS,
    SB_ALPHA,
    _RING_AFTER,
    _RING_BEFORE,
    bigram_backoff_surprisal,
    consistent_hash_rebalance,
    exact_quantile_selection,
    ngram_novelty_by_source,
    token_compression_gate,
)

_BPE = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9 ]")


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    ).collect()


def _toks(text: str) -> list[str]:
    return [t for t in text.split(" ") if t]


# ---------------------------------------------------------------------------
# E255
# ---------------------------------------------------------------------------


def test_compression_gate_matches_python(spark, sf_dir):
    rows = _docs(spark, sf_dir)
    ref: dict[str, list[int]] = {}
    for r in rows:
        b = ref.setdefault(r.source, [0, 0, 0, 0])
        b[0] += 1
        b[1] += len(r.text.encode("utf-8"))
        b[2] += len(r.text)
        b[3] += len(_BPE.findall(r.text))
    got = {
        r.source: r for r in token_compression_gate(spark, sf_dir).collect()
    }
    assert set(got) == set(ref)
    cb = sum(v[1] for v in ref.values())
    ct = sum(v[3] for v in ref.values())
    for src, (nd, nb, nc, nt) in ref.items():
        g = got[src]
        assert (g.n_docs, g.n_bytes, g.n_tokens) == (nd, nb, nt)
        assert g.bytes_per_token_ppm == nb * 1_000_000 // nt
        assert g.chars_per_token_ppm == nc * 1_000_000 // nt
        assert g.fertility_outlier == (
            nb * ct * 2 > cb * nt * 3 or nb * ct * 3 < cb * nt * 2
        )


# ---------------------------------------------------------------------------
# E258
# ---------------------------------------------------------------------------


def test_ngram_novelty_matches_python(spark, sf_dir):
    rows = _docs(spark, sf_dir)
    doc_sh: dict[int, set[str]] = {}
    doc_src: dict[int, str] = {}
    for r in rows:
        t = _toks(r.text)
        doc_src[r.doc_id] = r.source
        doc_sh[r.doc_id] = {
            hashlib.md5(" ".join(t[i : i + NOVELTY_W]).encode()).hexdigest()
            for i in range(len(t) - NOVELTY_W + 1)
        }
    df: Counter = Counter()
    for shs in doc_sh.values():
        df.update(shs)
    ref: dict[str, list[int]] = {}
    for did, shs in doc_sh.items():
        if not shs:
            continue
        n_sh = len(shs)
        n_dup = sum(1 for h in shs if df[h] >= 2)
        b = ref.setdefault(doc_src[did], [0, 0, 0, 0])
        b[0] += 1
        b[1] += n_sh
        b[2] += n_dup
        b[3] += 1 if n_dup * 1_000_000 // n_sh >= MEMORIZED_PPM else 0
    got = {
        r.source: r for r in ngram_novelty_by_source(spark, sf_dir).collect()
    }
    assert set(got) == set(ref)
    for src, (nd, nsh, ndup, nmem) in ref.items():
        g = got[src]
        assert (g.n_docs_scored, g.n_shingles, g.n_duplicated) == (nd, nsh, ndup)
        assert g.novelty_ppm == (nsh - ndup) * 1_000_000 // nsh
        assert g.n_docs_memorized == nmem


# ---------------------------------------------------------------------------
# E259
# ---------------------------------------------------------------------------


def test_quantile_selection_exact(spark, sf_dir):
    vals = sorted(
        int(math.floor(r.o_totalprice * 100 + 0.5))
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_totalprice")
        .collect()
    )
    n = len(vals)
    got = {r.p: r for r in exact_quantile_selection(spark, sf_dir).collect()}
    assert set(got) == set(QSEL_PS)
    for p in QSEL_PS:
        r = max(1, n * p // 100)
        assert got[p].target_rank == r
        assert got[p].quantile_cents == vals[r - 1]
        assert got[p].quantile_value == vals[r - 1] / 100.0


# ---------------------------------------------------------------------------
# E260
# ---------------------------------------------------------------------------


def test_bigram_surprisal_matches_python(spark, sf_dir):
    rows = _docs(spark, sf_dir)
    bg_s: Counter = Counter()
    un_s: Counter = Counter()
    for r in rows:
        t = _toks(r.text)
        for w in t:
            un_s[(r.source, w)] += 1
        for a, b in zip(t, t[1:]):
            bg_s[(r.source, a, b)] += 1
    bg_t: Counter = Counter()
    for (_, a, b), c in bg_s.items():
        bg_t[(a, b)] += c
    un_t: Counter = Counter()
    ns: Counter = Counter()
    for (s, w), c in un_s.items():
        un_t[w] += c
        ns[s] += c
    nt = sum(un_t.values())
    v = len(un_t)

    ref: dict[str, list[float]] = {}
    for (s, a, b), cs in bg_s.items():
        excl = bg_t[(a, b)] - cs
        if excl > 0:
            sc = excl / (un_t[a] - un_s.get((s, a), 0))
        else:
            sc = SB_ALPHA * (un_t[b] - un_s.get((s, b), 0) + 1) / (nt - ns[s] + v)
        acc = ref.setdefault(s, [0, 0, 0])
        acc[0] += cs
        acc[1] += cs if excl == 0 else 0
        # Mirror the query's ADVICE-r9 fix: per-term micro-unit
        # quantization, then an exact (order-immune) integer sum.
        acc[2] += math.floor(cs * -math.log(sc) * 1e6 + 0.5)
    got = {
        r.source: r for r in bigram_backoff_surprisal(spark, sf_dir).collect()
    }
    assert set(got) == set(ref)
    for src, (npos, nback, qsum) in ref.items():
        g = got[src]
        assert g.n_bigram_positions == npos
        assert g.backoff_ppm == nback * 1_000_000 // npos
        # The engine sum is now an exact integer, so run-to-run (merge
        # order) variance is gone; the remaining slack is only Python
        # libm vs JVM libm ulps on the per-term ln.
        assert abs(g.avg_surprisal - round(qsum / 1e6 / npos, 4)) <= 1e-4 + 1e-9


# ---------------------------------------------------------------------------
# E261
# ---------------------------------------------------------------------------


def _assign(ring: list[str], key: str) -> int:
    succ = [e for e in ring if e[:16] >= key]
    return int((succ[0] if succ else ring[0])[17:19])


def test_consistent_hash_matches_python(spark, sf_dir):
    rows = _docs(spark, sf_dir)
    before: Counter = Counter()
    after: Counter = Counter()
    moved: Counter = Counter()
    for r in rows:
        k = hashlib.md5(f"doc:{r.doc_id}".encode()).hexdigest()[:16]
        sb, sa = _assign(_RING_BEFORE, k), _assign(_RING_AFTER, k)
        before[sb] += 1
        after[sa] += 1
        if sb != sa:
            moved[sa] += 1
    got = {r.shard: r for r in consistent_hash_rebalance(spark, sf_dir).collect()}
    assert set(got) == set(range(CH_SHARDS + 1))
    for s in range(CH_SHARDS + 1):
        g = got[s]
        assert (g.docs_before, g.docs_after, g.moved_in) == (
            before[s],
            after[s],
            moved[s],
        )


def test_consistent_hash_minimal_movement(spark, sf_dir):
    """The property the operator certifies: adding a shard only moves docs
    TO the new shard — no survivor-to-survivor churn."""
    rows = consistent_hash_rebalance(spark, sf_dir).collect()
    assert all(r.minimal_movement_ok for r in rows)
    for r in rows:
        if r.shard != CH_NEW:
            assert r.moved_in == 0
    total_before = sum(r.docs_before for r in rows)
    total_after = sum(r.docs_after for r in rows)
    assert total_before == total_after > 0


# ---------------------------------------------------------------------------
# E262
# ---------------------------------------------------------------------------


def test_zonemap_perfect_skip_on_clustered_layout(spark, sf_dir):
    """Layout B (month-clustered) must skip every file outside the probed
    year, so rows_scanned_b == exact per-year row count; layout A
    (insertion order) must never skip MORE than B."""
    from big_data__instagram_analysis_spark.queries.ops_gates import (
        ZM_YEARS,
        zonemap_skip_rate,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_shipdate")
    per_year = {
        r.y: r.c
        for r in li.groupBy(F_year("l_shipdate").alias("y"))
        .agg(F_count().alias("c"))
        .collect()
    }
    rows = {r.year: r for r in zonemap_skip_rate(spark, sf_dir).collect()}
    assert set(rows) == set(ZM_YEARS)
    for y, r in rows.items():
        # month files never straddle a year boundary -> exact pruning
        assert r.rows_scanned_b == per_year.get(y, 0)
        # ADVICE r9: compare only the NORMALIZED skip rates — the absolute
        # skipped-file counts ride on layout-dependent file totals
        # (files_a grows with the corpus, files_b is ~84 months), so the
        # absolute ordering can legitimately flip at a larger tier even
        # when the ppm ordering (the layout-quality claim) holds.
        assert 0 <= r.skip_ppm_a <= r.skip_ppm_b <= 1_000_000


def F_year(c):
    from pyspark.sql import functions as F

    return F.year(c)


def F_count():
    from pyspark.sql import functions as F

    return F.count(F.lit(1))


# ---------------------------------------------------------------------------
# E263
# ---------------------------------------------------------------------------


def test_association_rules_matches_python(spark, sf_dir):
    from big_data__instagram_analysis_spark.queries.ops_gates import (
        association_rules_copurchase,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    part = {
        r.p_partkey: r.p_brand
        for r in spark.read.parquet(f"{sf_dir}/part.parquet").collect()
    }
    baskets: dict[int, set[str]] = {}
    for r in li.collect():
        baskets.setdefault(r.l_orderkey, set()).add(part[r.l_partkey])
    n = len(baskets)
    singles: Counter = Counter()
    pairs: Counter = Counter()
    for brands in baskets.values():
        for b in brands:
            singles[b] += 1
        bs = sorted(brands)
        for i in range(len(bs)):
            for j in range(i + 1, len(bs)):
                pairs[(bs[i], bs[j])] += 1
    got = association_rules_copurchase(spark, sf_dir).collect()
    assert 0 < len(got) <= 20
    for g in got:
        sp = pairs[(g.brand_a, g.brand_b)]
        sa, sb = singles[g.brand_a], singles[g.brand_b]
        assert g.pair_orders == sp and g.orders_a == sa and g.orders_b == sb
        assert g.support_ppm == sp * 1_000_000 // n
        assert g.confidence_ppm == sp * 1_000_000 // sa
        assert g.lift_ppm == sp * 1_000_000 * n // sa // sb
    # top-k really is the max-lift prefix of the full rule set
    all_lifts = sorted(
        (
            pairs[(a, b)] * 1_000_000 * n // singles[a] // singles[b]
            for (a, b) in pairs
        ),
        reverse=True,
    )
    assert [g.lift_ppm for g in got] == all_lifts[: len(got)]


# ---------------------------------------------------------------------------
# E264
# ---------------------------------------------------------------------------


def test_join_cardinality_prediction_is_exact(spark, sf_dir):
    """The whole point: predicted_rows from the count histograms equals
    the actual join output size."""
    from big_data__instagram_analysis_spark.io import load
    from big_data__instagram_analysis_spark.queries.ops_gates import (
        join_cardinality_estimate,
    )

    ev = load(spark, sf_dir, "events").select("user_id")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_custkey")
    actual = ev.join(od, ev.user_id == od.o_custkey).count()
    rows = join_cardinality_estimate(spark, sf_dir).collect()
    assert rows and all(r.predicted_rows == actual for r in rows)
    assert rows == sorted(rows, key=lambda r: (-r.contribution, r.user_id))


# ---------------------------------------------------------------------------
# E265 (lives in subqueries.py but tested with this batch)
# ---------------------------------------------------------------------------


def test_repeat_purchase_chains_matches_python(spark, sf_dir):
    from big_data__instagram_analysis_spark.queries.subqueries import (
        CHAIN_MAX_HOP,
        repeat_purchase_chains,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .collect()
    )
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append((r.o_orderdate, r.o_orderkey))
    reach: Counter = Counter()
    wait: Counter = Counter()
    for orders in by_cust.values():
        orders.sort()
        first = orders[0][0]
        for hop, (d, _) in enumerate(orders[: CHAIN_MAX_HOP + 1]):
            reach[hop] += 1
            wait[hop] += (d - first).days
    got = {r.hop: r for r in repeat_purchase_chains(spark, sf_dir).collect()}
    assert set(got) == {h for h in reach}
    prev = None
    for hop in sorted(got):
        g = got[hop]
        assert g.n_customers == reach[hop]
        assert g.total_wait_days == wait[hop]
        assert g.avg_wait_days_ppm == wait[hop] * 1_000_000 // reach[hop]
        # reach is monotone non-increasing: a linear chain cannot re-grow
        assert prev is None or g.n_customers <= prev
        prev = g.n_customers


# ---------------------------------------------------------------------------
# E267
# ---------------------------------------------------------------------------


def test_k_anonymity_matches_python(spark, sf_dir):
    from big_data__instagram_analysis_spark.queries.ops_gates import (
        KANON_K,
        k_anonymity_audit,
    )

    cust = {
        r.c_custkey: (r.c_mktsegment, r.c_nationkey)
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    }
    groups: Counter = Counter()
    for r in (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey", "o_orderdate")
        .collect()
    ):
        seg, nat = cust[r.o_custkey]
        groups[(seg, nat, r.o_orderdate.year)] += 1
    ref: dict[str, list[int]] = {}
    for (seg, _, _), sz in groups.items():
        b = ref.setdefault(seg, [0, 0, 0, 0])
        b[0] += sz
        b[1] += 1
        if sz < KANON_K:
            b[2] += 1
            b[3] += sz
    got = {r.mktsegment: r for r in k_anonymity_audit(spark, sf_dir).collect()}
    assert set(got) == set(ref)
    for seg, (nr, ng, nsg, rar) in ref.items():
        g = got[seg]
        assert (g.n_rows, g.n_groups, g.n_small_groups, g.rows_at_risk) == (
            nr,
            ng,
            nsg,
            rar,
        )
        assert g.risk_ppm == rar * 1_000_000 // nr


# ---------------------------------------------------------------------------
# E268
# ---------------------------------------------------------------------------


def test_rle_audit_matches_python_and_clustering_wins(spark, sf_dir):
    from big_data__instagram_analysis_spark.queries.ops_gates import (
        ZM_CHUNK,
        rle_sortedness_audit,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_returnflag")
        .collect()
    )
    recs = [
        (
            r.l_orderkey // ZM_CHUNK,
            r.l_orderkey,
            r.l_linenumber,
            r.l_shipdate.strftime("%Y-%m-%d"),
            r.l_returnflag,
        )
        for r in rows
    ]

    def breaks(part_of, key_of, val_of):
        by_part: dict = {}
        for rec in recs:
            by_part.setdefault(part_of(rec), []).append(rec)
        b = 0
        for part in by_part.values():
            part.sort(key=key_of)
            prev = object()
            for rec in part:
                if val_of(rec) != prev:
                    b += 1
                prev = val_of(rec)
        return b

    ref_ins_day = breaks(
        lambda r: r[0], lambda r: (r[1], r[2], r[3]), lambda r: r[3]
    )
    got = {
        (r.layout, r.col): r for r in rle_sortedness_audit(spark, sf_dir).collect()
    }
    assert got[("insertion", "ship_day")].n_runs == ref_ins_day
    for col in ("ship_day", "returnflag"):
        ins, clu = got[("insertion", col)], got[("clustered", col)]
        assert ins.n_rows == clu.n_rows == len(recs)
        # the property the audit exists to show: clustering never loses
        assert clu.rle_savings_ppm >= ins.rle_savings_ppm
