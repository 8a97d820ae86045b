"""A/B: json_extract_k parse-before-exchange variants (VERDICT r10 task #2).

The r10 attribution: events.parquet at sf0.1 is ONE 2 MB row-group, so the
scan+parse stage is a single task — 100k Jackson parses single-threaded —
while DuckDB parallelizes inside the row group (2048-row vectors). This
script measures, on one warm JVM with interleaved reps:

  v0_from_json        current shipped form (scan → from_json → partial agg)
  v1_repart_parse     repartition(8) the RAW props strings, parse after
                      (the r10-measured-negative variant, re-measured)
  v2_get_json_object  path-at-a-time parse, no struct conversion
  v3_multi_rowgroup   v0 against a 8-row-group copy of events (layout A/B:
                      if dp collapses, the gap is fixture layout, not plan)
  v4_regexp           regexp_extract fast-path (semantics check only — NOT
                      shippable unless exactly equal to from_json on the
                      fixture domain; printed for attribution)

Each rep pairs the sf0.1 wall with a 1-row floor wall (same ABAB idea as
bench.py) so the dp (datapath) is comparable to BENCH dp numbers.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from big_data__instagram_analysis_spark.io import load
from big_data__instagram_analysis_spark.session import enable_bench_tuning, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "7"))


def v0_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.select(F.from_json("props", "k INT").getField("k").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k")
    )


def v1_repart_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.select("props")
        .repartition(8)
        .select(F.from_json("props", "k INT").getField("k").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k")
    )


def v2_get_json_object(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.select(
            F.get_json_object("props", "$.k").cast("int").alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k")
    )


def v4_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.select(
            F.regexp_extract("props", r'"k"\s*:\s*(-?\d+)', 1)
            .cast("int")
            .alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k")
    )


def v5_hybrid_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchored full-match fast path + from_json fallback — EXACT for any
    input: the regex only wins when the entire document is {"k": <=9-digit
    int}, where $.k is unambiguous; every other shape (nested, float,
    overflow, malformed, null) takes the v0 Jackson path per-row."""
    e = load(spark, sf_dir, "events")
    fast = F.regexp_extract("props", r'\A\{[ \t\r\n]*"k"[ \t\r\n]*:[ \t\r\n]*(-?(?:0|[1-9]\d{0,8}))[ \t\r\n]*\}\z', 1)
    k = F.when(fast != F.lit(""), fast.cast("int")).otherwise(
        F.from_json("props", "k INT").getField("k")
    )
    return (
        e.select(k.alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k")
    )


def _guarded(e: DataFrame) -> DataFrame:
    sc = e.sparkSession.sparkContext
    n_parts = len(e.inputFiles()) or 1
    if n_parts * 4 < sc.defaultParallelism:
        return e.select("props").repartition(sc.defaultParallelism // 2)
    return e.select("props")


def v6_guard_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _guarded(load(spark, sf_dir, "events"))
    fast = F.regexp_extract("props", r'\A\{[ \t\r\n]*"k"[ \t\r\n]*:[ \t\r\n]*(-?(?:0|[1-9]\d{0,8}))[ \t\r\n]*\}\z', 1)
    k = F.when(fast != F.lit(""), fast.cast("int")).otherwise(
        F.from_json("props", "k INT").getField("k")
    )
    return (
        e.select(k.alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k")
    )


def v7_guard_fromjson(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _guarded(load(spark, sf_dir, "events"))
    return (
        e.select(F.from_json("props", "k INT").getField("k").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k")
    )


def v8_coalesce_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same exactness as v5 but ONE regex evaluation: coalesce is lazy in
    codegen, and nullif('')→cast gives null exactly when the anchored
    fast-path missed, which is exactly when from_json must run."""
    e = load(spark, sf_dir, "events")
    fast = F.regexp_extract("props", r'\A\{[ \t\r\n]*"k"[ \t\r\n]*:[ \t\r\n]*(-?(?:0|[1-9]\d{0,8}))[ \t\r\n]*\}\z', 1)
    k = F.coalesce(
        F.nullif(fast, F.lit("")).cast("int"),
        F.from_json("props", "k INT").getField("k"),
    )
    return (
        e.select(k.alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k")
    )


def main() -> None:
    enable_bench_tuning()
    spark = get_spark("ab-json-extract-r11")

    # Build the multi-row-group events copy (8 row groups) and a 1-row floor.
    import pyarrow.parquet as pq

    mrg_dir = "/root/repo/spark-warehouse/ab_events_mrg"
    floor_dir = "/root/repo/spark-warehouse/ab_events_floor"
    src = os.path.join(SF_DIR, "events.parquet")
    t = pq.read_table(src)
    os.makedirs(mrg_dir, exist_ok=True)
    os.makedirs(floor_dir, exist_ok=True)
    pq.write_table(
        t, os.path.join(mrg_dir, "events.parquet"),
        row_group_size=max(1, t.num_rows // 8),
    )
    pq.write_table(t.slice(0, 1), os.path.join(floor_dir, "events.parquet"))

    variants = {
        "v0_from_json": (v0_from_json, SF_DIR),
        "v1_repart_parse": (v1_repart_parse, SF_DIR),
        "v2_get_json_object": (v2_get_json_object, SF_DIR),
        "v3_multi_rowgroup": (v0_from_json, mrg_dir),
        "v4_regexp": (v4_regexp, SF_DIR),
        "v5_hybrid_exact": (v5_hybrid_exact, SF_DIR),
        "v6_guard_hybrid": (v6_guard_hybrid, SF_DIR),
        "v7_guard_fromjson": (v7_guard_fromjson, SF_DIR),
        "v8_coalesce_exact": (v8_coalesce_exact, SF_DIR),
    }

    # Adversarial semantics probe for v5: shapes where a naive regex would
    # lie must take the Jackson path and agree with v0 exactly.
    adv = spark.createDataFrame(
        [
            ('{"k": 7}',), ('{"k":-3}',), ('{ "k" : 42 }',),
            ('{"a": {"k": 5}}',), ('{"k": 7.5}',), ('{"k": null}',),
            ('{"kk": 9}',), ('{"a": "k\": 9", "k": 11}',), (None,),
            ('{"k": 1234567890123}',), ('not json',), ('{"k": "12"}',),
            ('{"k": 12, "j": 1}',),
        ],
        "props string",
    )
    v0k = adv.select(
        F.from_json("props", "k INT").getField("k").alias("k")
    ).toPandas()
    fast = F.regexp_extract("props", r'\A\{[ \t\r\n]*"k"[ \t\r\n]*:[ \t\r\n]*(-?(?:0|[1-9]\d{0,8}))[ \t\r\n]*\}\z', 1)
    v5k = adv.select(
        F.when(fast != F.lit(""), fast.cast("int"))
        .otherwise(F.from_json("props", "k INT").getField("k"))
        .alias("k")
    ).toPandas()
    print("ADVERSARIAL v5 == v0:", v0k.equals(v5k))
    if not v0k.equals(v5k):
        print(v0k.join(v5k, lsuffix="_v0", rsuffix="_v5"))
    v8k = adv.select(
        F.coalesce(
            F.nullif(fast, F.lit("")).cast("int"),
            F.from_json("props", "k INT").getField("k"),
        ).alias("k")
    ).toPandas()
    print("ADVERSARIAL v8 == v0:", v0k.equals(v8k))
    if not v0k.equals(v8k):
        print(v0k.join(v8k, lsuffix="_v0", rsuffix="_v8"))

    # Semantics check: every variant must produce identical rows to v0.
    base = v0_from_json(spark, SF_DIR).toPandas()
    for name, (fn, d) in variants.items():
        got = fn(spark, d).toPandas()
        same = base.equals(got)
        print(f"SEMANTICS {name}: {'OK' if same else 'MISMATCH'}")
        if not same and name != "v3_multi_rowgroup":
            print(got.head())

    # Warm both shapes.
    for _ in range(3):
        for name, (fn, d) in variants.items():
            fn(spark, d).toPandas()
            fn(spark, floor_dir).toPandas()

    walls: dict[str, list[float]] = {n: [] for n in variants}
    floors: dict[str, list[float]] = {n: [] for n in variants}
    for _ in range(REPS):
        for name, (fn, d) in variants.items():
            t0 = time.perf_counter()
            fn(spark, d).toPandas()
            walls[name].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            fn(spark, floor_dir).toPandas()
            floors[name].append(time.perf_counter() - t0)

    out = {}
    for name in variants:
        w = statistics.median(walls[name])
        f_ = statistics.median(floors[name])
        out[name] = {
            "wall_med": round(w, 4),
            "floor_med": round(f_, 4),
            "dp_med": round(w - f_, 4),
            "walls": [round(x, 4) for x in walls[name]],
        }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
