"""Spot-check named queries against their DuckDB oracles, driver-style.

Usage: python tools/check_queries.py [--sf SFDIR] name [name ...]
Runs each named query on a hostile-ish session (non-UTC tz like the driver)
and compares to its oracle with the package's compare_frames. Rows-only
queries just print row counts.
"""
import argparse
import sys

sys.path.insert(0, "/root/repo")

import duckdb

from pyspark.sql import SparkSession


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-queries")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from big_data__instagram_analysis_spark.oracle import compare_frames

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    fails = 0
    for name in args.names:
        if name not in qs:
            print(f"[??] {name}: not registered")
            fails += 1
            continue
        spdf = qs[name](spark, args.sf).toPandas()
        if name in os_:
            dpdf = con.execute(os_[name]).fetchdf()
            r = compare_frames(name, spdf, dpdf)
            print(r.summary())
            if not r.ok:
                fails += 1
                print("  spark:", spdf.head(12).to_dict("records"))
                print("  duck :", dpdf.head(12).to_dict("records"))
        else:
            print(f"[rows] {name}: {len(spdf)} rows")
    print("FAILS:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
