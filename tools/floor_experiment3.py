#!/usr/bin/env python
"""Experiment 3: raw stage-floor primitives + builder-time knobs.

Each variant gets its OWN JVM (builder-time confs differ). Measures:
  empty    — spark.range(1).toPandas()            (job submit + collect floor)
  scan1    — lineitem scan+count                   (1 stage)
  shuffle2 — range(600k) groupBy mod count         (2 stages)
  set      — the 10-query headline set, sequential
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time, json
sys.path.insert(0, "@@REPO@@")
from big_data__instagram_analysis_spark import session as S
from big_data__instagram_analysis_spark.registry import get_specs
from big_data__instagram_analysis_spark.session import enable_bench_tuning
from pyspark.sql import SparkSession, functions as F

extra = json.loads(os.environ["EXP_BUILDER_CONFS"])
enable_bench_tuning()
S.RUNTIME_CONF.update({
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.shuffle.partitions": "4",
})
b = (SparkSession.builder.master("local[32]").appName("floor3")
     .config("spark.driver.memory", "16g").config("spark.ui.enabled", "false")
     .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC"))
for k, v in extra.items():
    b = b.config(k, v)
spark = S.tune(b.getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"
specs = get_specs()
names = [n for n, s in sorted(specs.items()) if "bench" in s.tags or "flagship" in s.tags]

def mintime(fn, n=8):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
    return min(ts)

li = spark.read.parquet(SF + "/lineitem.parquet")
for _ in range(3):
    spark.range(1).toPandas(); li.count()
    spark.range(600000).groupBy((F.col("id") % 10).alias("m")).count().toPandas()
    for n in names: specs[n].fn(spark, SF).toPandas()

empty = mintime(lambda: spark.range(1).toPandas())
scan1 = mintime(lambda: spark.read.parquet(SF + "/lineitem.parquet").count())
shuf2 = mintime(lambda: spark.range(600000).groupBy((F.col("id") % 10).alias("m")).count().toPandas())

best = None
for _ in range(3):
    dfs = {n: specs[n].fn(spark, SF) for n in names}
    t0 = time.perf_counter()
    for n in names: dfs[n].toPandas()
    tot = time.perf_counter() - t0
    best = tot if best is None or tot < best else best
print(json.dumps({"empty": round(empty,4), "scan1": round(scan1,4),
                  "shuffle2": round(shuf2,4), "set": round(best,4)}))
spark.stop()
"""

VARIANTS = {
    "combined": {},
    "+nocompress": {
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
        "spark.broadcast.compress": "false",
        "spark.rdd.compress": "false",
    },
    "+localitywait0": {"spark.locality.wait": "0"},
    "+both": {
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
        "spark.broadcast.compress": "false",
        "spark.locality.wait": "0",
    },
    "+both+cpus8": {
        "spark.shuffle.compress": "false",
        "spark.broadcast.compress": "false",
        "spark.locality.wait": "0",
        "spark.master": "local[8]",
    },
}

import json

for label, confs in VARIANTS.items():
    env = dict(os.environ, EXP_BUILDER_CONFS=json.dumps(confs))
    out = subprocess.run([sys.executable, "-c", CHILD.replace("@@REPO@@", REPO_ROOT)],
                         env=env, capture_output=True, text=True, timeout=400)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    print(f"{label:18s} {line[-1] if line else 'FAIL: ' + out.stderr[-300:]}", flush=True)
