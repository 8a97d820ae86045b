#!/usr/bin/env python
"""Audit: which queries emit high-magnitude rounded DOUBLE columns at sf0.1?

round(sum(double), d) output is run-to-run flaky when the group sum's
float-reorder noise (~1e-12 relative x magnitude) approaches the rounding
boundary window (0.5 x 10^-d): at 2dp that's any sum >= ~1e6-1e7. The sf0.1
sweep caught two such flakes (star_join_profit, snapshot_diff_cdc); this
audit lists every query whose output contains a float64 column with
|value| >= THRESH so they can be hardened to exact integer units.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
THRESH = float(os.environ.get("AUDIT_THRESH", "1e6"))

from big_data__instagram_analysis_spark.registry import get_specs
from big_data__instagram_analysis_spark.session import enable_bench_tuning, get_spark

import numpy as np

enable_bench_tuning()
spark = get_spark("sum-audit")
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"

flagged = []
for name, spec in sorted(get_specs().items()):
    try:
        pdf = spec.fn(spark, SF).toPandas()
    except Exception as e:
        print(f"[ERR ] {name}: {e}", flush=True)
        continue
    hits = []
    for col in pdf.columns:
        if pdf[col].dtype == np.float64 and len(pdf):
            mx = np.nanmax(np.abs(pdf[col].to_numpy(dtype=float, na_value=0.0)))
            if mx >= THRESH:
                hits.append(f"{col}:max|v|={mx:.3g}")
    if hits:
        flagged.append(name)
        print(f"[FLAG] {name}: {', '.join(hits)}", flush=True)
print("flagged:", len(flagged))
