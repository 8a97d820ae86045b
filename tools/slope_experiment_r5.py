#!/usr/bin/env python
"""Two-point (sf0.01, sf0.1) decomposition: fixed floor vs marginal slope.

The scale argument for the 2x bar is about MARGINAL cost: at 100 TB all
per-job/per-stage fixed costs amortize to zero and what remains is the
per-byte datapath slope. Measure, warm, min-of-N:

  spark:  headline set at sf0.01 and sf0.1 (one warm session)
  duckdb: the BASELINE.md S4 query set at sf0.01 and sf0.1 (one process)

slope = wall(sf0.1) - wall(sf0.01) per query; ratio = spark_slope/duck_slope.
"""
from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SF01 = "/root/testdata/sf0.1"
SF001 = "/root/testdata/sf0.01"

DUCK_QUERIES = {
    "pricing_summary": """
SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) q, count(*) n
FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus ORDER BY 1,2""",
    "join_revenue_by_nation": """
SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
FROM customer JOIN orders ON c_custkey=o_custkey
JOIN lineitem ON l_orderkey=o_orderkey
JOIN nation ON c_nationkey=n_nationkey
JOIN region ON n_regionkey=r_regionkey
WHERE r_name='ASIA' GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "window_topk_orders": """
SELECT * FROM (SELECT o_custkey,o_orderkey,o_totalprice,
 row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) rn
FROM orders) t WHERE rn<=3 ORDER BY o_custkey, rn""",
    "distinct_custs_by_priority": """
SELECT o_orderpriority, count(DISTINCT o_custkey) n FROM orders
GROUP BY o_orderpriority ORDER BY 1""",
    "rollup_qty": """
SELECT l_returnflag,l_linestatus,round(sum(l_quantity),2) q,count(*) n
FROM lineitem GROUP BY ROLLUP(l_returnflag,l_linestatus) ORDER BY 1,2""",
    "events_hourly": """
SELECT user_id,event_type,strftime(ts,'%Y-%m-%d') d,hour(ts) h,count(*) n,
 round(sum(value),2) v FROM events GROUP BY 1,2,3,4 ORDER BY n DESC,1,2,3,4 LIMIT 100""",
    "json_extract_k": """
SELECT CAST(json_extract(props,'$.k') AS INT) k, count(*) n FROM events
GROUP BY k ORDER BY k""",
    "customers_without_orders": """
SELECT count(*) n FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""",
    "doc_stats_by_lang": """
SELECT lang, count(*) n, round(avg(length(text)),2) avg_len FROM documents
GROUP BY lang ORDER BY lang""",
    "embed_knn_allpairs": """
WITH v AS (SELECT vec_id, list_transform(embedding, x->CAST(x AS DOUBLE)) e FROM embeddings)
SELECT a.vec_id va, b.vec_id vb,
 list_sum(list_transform(range(1,65), i-> a.e[i]*b.e[i])) /
 (sqrt(list_sum(list_transform(a.e, x->x*x)))*sqrt(list_sum(list_transform(b.e, x->x*x)))) s
FROM v a, v b WHERE a.vec_id < b.vec_id ORDER BY s DESC LIMIT 10""",
}


def duck_walls(sf_dir: str, reps: int = 5) -> dict[str, float]:
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    for q in DUCK_QUERIES.values():  # warm
        con.execute(q).fetchall()
    out = {}
    for name, q in DUCK_QUERIES.items():
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            con.execute(q).fetchall()
            walls.append(time.perf_counter() - t0)
        out[name] = min(walls)
    con.close()
    return out


def spark_walls(reps: int = 5) -> tuple[dict[str, float], dict[str, float]]:
    from big_data__instagram_analysis_spark.registry import get_specs
    from big_data__instagram_analysis_spark.session import (
        enable_bench_tuning,
        get_spark,
    )

    enable_bench_tuning()
    spark = get_spark("iga-slope")
    spark.sparkContext.setLogLevel("ERROR")
    specs = get_specs()
    names = [n for n, s in sorted(specs.items()) if "bench" in s.tags or "flagship" in s.tags]
    for _ in range(3):
        for n in names:
            specs[n].fn(spark, SF01).toPandas()
            specs[n].fn(spark, SF001).toPandas()
    w01: dict[str, list[float]] = {n: [] for n in names}
    w001: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for n in names:
            df = specs[n].fn(spark, SF001)
            t0 = time.perf_counter()
            df.toPandas()
            w001[n].append(time.perf_counter() - t0)
            df = specs[n].fn(spark, SF01)
            t0 = time.perf_counter()
            df.toPandas()
            w01[n].append(time.perf_counter() - t0)
    spark.stop()
    return {n: min(v) for n, v in w01.items()}, {n: min(v) for n, v in w001.items()}


def main() -> None:
    d01 = duck_walls(SF01)
    d001 = duck_walls(SF001)
    s01, s001 = spark_walls()
    print(f"{'query':28s} {'sp01':>7s} {'sp001':>7s} {'spSlope':>8s} {'dk01':>7s} {'dk001':>7s} {'dkSlope':>8s} {'ratio':>6s}")
    tot_ss = tot_ds = 0.0
    for n in sorted(s01):
        ss = s01[n] - s001[n]
        ds = d01.get(n, 0) - d001.get(n, 0)
        tot_ss += ss
        tot_ds += ds
        r = ss / ds if ds > 0 else float("nan")
        print(f"{n:28s} {s01[n]:7.4f} {s001[n]:7.4f} {ss:8.4f} {d01.get(n,0):7.4f} {d001.get(n,0):7.4f} {ds:8.4f} {r:6.2f}")
    print(f"{'TOTAL':28s} {sum(s01.values()):7.4f} {sum(s001.values()):7.4f} {tot_ss:8.4f} "
          f"{sum(d01.values()):7.4f} {sum(d001.values()):7.4f} {tot_ds:8.4f} {tot_ss/tot_ds:6.2f}")


if __name__ == "__main__":
    main()
