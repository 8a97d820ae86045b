"""Simulate the grading driver: fresh session with NON-default tz, driver-style compare."""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import duckdb, pandas as pd

# Hostile driver session: different timezone, no tuning, default confs
spark = (SparkSession.builder.master("local[8]")
         .appName("driver-sim")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entrymod

# 1. smoke: entry()
df = entrymod.entry(spark)
rows = df.collect()
print("SMOKE entry() rows:", len(rows), "schema:", [f.name for f in df.schema.fields])
assert len(rows) > 0

# 2. correctness at sf0.01, driver-style
sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
qs, os_ = entrymod.queries(), entrymod.oracle_sql()
print("declared queries:", len(qs), "with oracle:", len(os_))
from big_data__instagram_analysis_spark.oracle import compare_frames
fails = 0
for name, fn in sorted(qs.items()):
    spdf = fn(spark, sf).toPandas()
    if name in os_:
        dpdf = con.execute(os_[name]).fetchdf()
        r = compare_frames(name, spdf, dpdf)
        print(r.summary())
        fails += 0 if r.ok else 1
    else:
        print(f"[rows] {name}: {len(spdf)} rows")
print("FAILS:", fails)
sys.exit(1 if fails else 0)
