"""ABAB within one session: stream-stream join state-partition count (r12).

The availableNow runs use a fresh temp checkpoint per invocation, so the
shuffle-partition conf re-binds at every query start — ABAB alternation in
one session is valid and cancels JVM drift.
"""
import gc
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("ab-ss2")
    .config("spark.sql.session.timeZone", "America/New_York")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as entrymod

qs = entrymod.queries()
SF = "/root/testdata/sf0.1"
DEFAULT = spark.conf.get("spark.sql.shuffle.partitions")
print("session default shuffle partitions:", DEFAULT)

for name in ("stream_stream_join_ttl", "stream_stream_join_pairs"):
    fn = qs[name]
    for parts in (DEFAULT, "8"):
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        fn(spark, SF).toPandas()  # warm each arm
    res = {DEFAULT: [], "8": []}
    for _ in range(4):
        for parts in (DEFAULT, "8"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            fn(spark, SF).toPandas()
            res[parts].append(time.perf_counter() - t0)
    spark.conf.set("spark.sql.shuffle.partitions", DEFAULT)
    for parts, ts in res.items():
        print(f"RESULT {name} parts={parts} min={min(ts):.2f} "
              f"mean={sum(ts)/len(ts):.2f} all={[round(t,2) for t in ts]}")
