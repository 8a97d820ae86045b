"""Audit: every SQL-oracle query's output schema must be hashable by the
driver's pandas-based comparator (no array/map/struct top-level columns).

Rows-only queries may emit complex types (the driver only counts rows), but
we flag them too so the choice is deliberate.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as ent
from pyspark.sql.types import ArrayType, MapType, StructType
from big_data__instagram_analysis_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark()
    qs = ent.queries()
    oracles = ent.oracle_sql()
    bad_sql, bad_rows = [], []
    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, SF_DIR)
        except Exception as e:  # noqa: BLE001
            print(f"BUILD-FAIL {name}: {e}")
            continue
        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            (bad_sql if name in oracles else bad_rows).append((name, complex_cols))
    print("SQL-checked queries with complex output columns (WILL crash hasher):")
    for name, cols in bad_sql:
        print(f"  {name}: {cols}")
    print("rows-only queries with complex output columns (OK but deliberate):")
    for name, cols in bad_rows:
        print(f"  {name}: {cols}")
    if not bad_sql:
        print("OK: no SQL-checked query emits complex columns")
    else:
        # Nonzero exit so this can gate CI, not just inform.
        sys.exit(1)


if __name__ == "__main__":
    main()
