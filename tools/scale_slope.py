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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--synth", default="3,10", help="comma list of sf0.1 multipliers; '' disables")
    ap.add_argument("--out", default=os.path.join(REPO_ROOT, "SCALE_SLOPE.json"))
    ap.add_argument("--queries", default=",".join(HEAVY_QUERIES))
    ap.add_argument("--merge", action="store_true",
                    help="update only the measured queries inside an existing --out")
    args = ap.parse_args()

    from big_data__instagram_analysis_spark.io import scratch_dir
    from big_data__instagram_analysis_spark.registry import get_specs
    from big_data__instagram_analysis_spark.session import enable_bench_tuning, get_spark

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
