#!/usr/bin/env python
"""Re-measure the DuckDB headline-set baseline on the CURRENT box.

VERDICT r12 next-round #2: HEADLINE_BASELINE.json was measured 2026-08-13
on the build-round box; this sandbox is re-provisioned between sessions
and runs 15-40% off that box, so the checked-in denominators no longer
certify the <1x-DuckDB claim. This tool re-runs the exact BASELINE.md §4
protocol (DuckDB views over the sf parquet, one connection, cold run then
warm = min of reps) and rewrites HEADLINE_BASELINE.json keyed by the
bench/registry query names. Run it in the SAME idle session window as a
fresh `python bench.py` so numerator and denominator describe one box
state.

Usage: python tools/headline_baseline_r13.py [--sf /root/testdata/sf0.1]
           [--reps 3] [--write] [--date YYYY-MM-DD]
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import duckdb

#: BASELINE.md §4 SQL, keyed by the bench/registry names (the §2 op-shape
#: labels live in HEADLINE_BASELINE.json's renamed_from).
QUERIES = {
    "pricing_summary": """SELECT l_returnflag, l_linestatus, sum(l_quantity) sum_qty,
        sum(l_extendedprice) sum_base, sum(l_extendedprice*(1-l_discount)) sum_disc,
        sum(l_extendedprice*(1-l_discount)*(1+l_tax)) sum_charge,
        avg(l_quantity) avg_qty, avg(l_extendedprice) avg_price, avg(l_discount) avg_disc,
        count(*) cnt FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY 1,2 ORDER BY 1,2""",
    "join_revenue_by_nation": """SELECT n_name, sum(l_extendedprice*(1-l_discount)) revenue
        FROM customer JOIN orders ON c_custkey=o_custkey
        JOIN lineitem ON l_orderkey=o_orderkey JOIN nation ON c_nationkey=n_nationkey
        JOIN region ON n_regionkey=r_regionkey WHERE r_name='ASIA'
        GROUP BY 1 ORDER BY revenue DESC""",
    "window_topk_orders": """SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) rn
        FROM orders) WHERE rn<=3""",
    "distinct_custs_by_priority": """SELECT o_orderpriority, count(DISTINCT o_custkey) ucust,
        count(*) n FROM orders GROUP BY 1 ORDER BY 1""",
    "rollup_qty": """SELECT l_returnflag, l_linestatus, sum(l_quantity) q FROM lineitem
        GROUP BY ROLLUP(l_returnflag,l_linestatus) ORDER BY 1,2""",
    "events_hourly": """SELECT user_id, event_type, date_trunc('hour', ts) h,
        count(*) n, sum(value) v FROM events GROUP BY 1,2,3 ORDER BY n DESC LIMIT 100""",
    "json_extract_k": """SELECT CAST(json_extract(props,'$.k') AS INT) k, count(*)
        FROM events GROUP BY 1 ORDER BY 1""",
    "customers_without_orders": """SELECT count(*) FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""",
    "doc_stats_by_lang": """SELECT lang, count(*) docs, avg(n_chars) avgc
        FROM documents GROUP BY 1 ORDER BY 1""",
    "embed_knn_allpairs": """SELECT a.vec_id, b.vec_id,
        list_cosine_similarity(a.embedding, b.embedding) sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        ORDER BY sim DESC LIMIT 10""",
}

RENAMED_FROM = {
    "join_revenue_by_nation": "join_3way_revenue",
    "window_topk_orders": "window_topk",
    "distinct_custs_by_priority": "agg_distinct",
    "rollup_qty": "rollup",
    "json_extract_k": "json_extract",
    "customers_without_orders": "antijoin",
    "doc_stats_by_lang": "text_tokens",
    "embed_knn_allpairs": "embed_knn_1",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--write", action="store_true")
    ap.add_argument("--date", required=True, help="measurement date YYYY-MM-DD")
    args = ap.parse_args()

    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    out: dict[str, dict] = {}
    for name, sql in QUERIES.items():
        t0 = time.perf_counter()
        rows_cold = len(con.execute(sql).fetchall())
        cold = time.perf_counter() - t0
        warm: list[float] = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            rows = len(con.execute(sql).fetchall())
            warm.append(time.perf_counter() - t0)
        assert rows == rows_cold
        out[name] = {
            "warm_sec": round(min(warm), 4),
            "warm_mean_sec": round(statistics.fmean(warm), 4),
            "warm_stdev_sec": round(statistics.stdev(warm), 4)
            if len(warm) > 1
            else 0.0,
            "cold_sec": round(cold, 4),
            "rows": rows,
        }
        print(
            f"{name:28s} warm={out[name]['warm_sec']:8.3f}s "
            f"(±{out[name]['warm_stdev_sec']:.3f}) cold={cold:8.3f}s rows={rows}"
        )

    total = round(sum(v["warm_sec"] for v in out.values()), 4)
    payload = {
        "metric": "headline_set_duckdb_warm_sec",
        "value": total,
        "unit": "sec",
        "sf_dir": args.sf,
        "engine": f"duckdb {duckdb.__version__}",
        "measured": args.date,
        "source": (
            "BASELINE.md §2/§4 protocol re-measured on the current box "
            "(tools/headline_baseline_r13.py, VERDICT r12 #2); keys use the "
            "bench/registry query names — 'renamed_from' maps to §2's "
            "op-shape labels"
        ),
        "queries": {n: v["warm_sec"] for n, v in out.items()},
        "renamed_from": RENAMED_FROM,
        "detail": out,
        "note": (
            "Checked-in so bench.py's per_query_dp_ratio and dp_gt2 flags "
            "track re-measurements automatically (ADVICE r8). warm = min of "
            "post-cold reps, one connection, views over the sf parquet."
        ),
    }
    print(json.dumps({k: payload[k] for k in ("metric", "value", "queries")}))
    if args.write:
        with open(os.path.join(REPO_ROOT, "HEADLINE_BASELINE.json"), "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
        print(f"wrote HEADLINE_BASELINE.json (total {total}s)")


if __name__ == "__main__":
    main()
