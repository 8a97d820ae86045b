"""A/B: shuffle-partition (= state-store instance) count for the two
stream-stream joins (r12). PERF s70 lever 1 measured the OTHER five slow
streaming rows at -3%; stream-stream joins carry 4 state stores per
partition per side, so the lever scales differently here.

Usage: python tools/ab_stream_join_parts_r12.py [parts ...]
Runs each named partition count in ITS OWN fresh session (state partition
count binds at checkpoint creation), 2 reps per query per setting.
"""
import gc
import subprocess
import sys
import time

if len(sys.argv) > 1 and sys.argv[1] == "--child":
    parts = sys.argv[2]
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master("local[8]")
        .appName(f"ab-ss-{parts}")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
    )
    if parts != "default":
        b = b.config("spark.sql.shuffle.partitions", parts)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in ("stream_stream_join_ttl", "stream_stream_join_pairs"):
        fn = qs[name]
        fn(spark, "/root/testdata/sf0.1").toPandas()  # warm (scratch build etc.)
        ts = []
        for _ in range(2):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            fn(spark, "/root/testdata/sf0.1").toPandas()
            ts.append(time.perf_counter() - t0)
        print(f"RESULT {name} parts={parts} min={min(ts):.2f} all={[round(t,2) for t in ts]}",
              flush=True)
    sys.exit(0)

for parts in sys.argv[1:] or ["default", "8"]:
    r = subprocess.run(
        [sys.executable, __file__, "--child", parts],
        capture_output=True, text=True, cwd="/root/repo",
    )
    for line in r.stdout.splitlines():
        if line.startswith("RESULT"):
            print(line)
    if r.returncode != 0:
        print("child failed:", r.stderr[-500:])
