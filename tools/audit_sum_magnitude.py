#!/usr/bin/env python
"""Audit: which queries emit high-magnitude DOUBLE columns at sf0.1?

round(sum(double), d) output is run-to-run flaky when the group sum's
float-reorder noise (~1e-12 relative x magnitude) approaches the rounding
boundary window (0.5 x 10^-d): at 2dp that's any sum >= ~1e6-1e7. The sf0.1
sweep caught two such flakes (star_join_profit, snapshot_diff_cdc); this
audit lists every query whose output contains a float64 column with
|value| >= THRESH so they can be hardened to exact integer units
(numeric.cents_sum — see PERF.md SS35).

Magnitude alone cannot tell a hardened column (exact bigint-cents / 100.0,
deterministic) from a raw double sum, so the tool keeps a BASELINE of
(query, column) pairs that were hand-verified safe after the round-4
hardening pass. Default run reports and fails only on flags NOT in the
baseline — i.e. newly introduced high-magnitude doubles that need the
cents_sum treatment (or a baseline entry once verified).

    python tools/audit_sum_magnitude.py                  # check vs baseline
    python tools/audit_sum_magnitude.py --write-baseline # re-baseline
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
THRESH = float(os.environ.get("AUDIT_THRESH", "1e6"))
BASELINE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "sum_magnitude_baseline.json")
WRITE = "--write-baseline" in sys.argv[1:]
try:
    BASELINE = {tuple(x) for x in json.load(open(BASELINE_PATH))}
except FileNotFoundError:
    BASELINE = set()

from big_data__instagram_analysis_spark.registry import get_specs
from big_data__instagram_analysis_spark.session import enable_bench_tuning, get_spark

import numpy as np

enable_bench_tuning()
spark = get_spark("sum-audit")
spark.sparkContext.setLogLevel("ERROR")
SF = os.environ.get("AUDIT_SF_DIR", "/root/testdata/sf0.1")
ONLY = os.environ.get("AUDIT_ONLY", "")  # regex filter on query names

flagged = []
new_flags = []
import re as _re
for name, spec in sorted(get_specs().items()):
    if ONLY and not _re.search(ONLY, name):
        continue
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
                hits.append(col)
                flagged.append((name, col))
                if (name, col) not in BASELINE:
                    new_flags.append((name, col, mx))
    if hits and WRITE:
        print(f"[FLAG] {name}: {', '.join(hits)}", flush=True)
for name, col, mx in new_flags:
    print(f"[NEW ] {name}.{col}: max|v|={mx:.3g} — harden with numeric.cents_sum or baseline after verification", flush=True)
if WRITE:
    with open(BASELINE_PATH, "w") as fh:
        json.dump(sorted(flagged), fh, indent=0)
    print("wrote baseline:", BASELINE_PATH, len(flagged), "entries")
print("flagged:", len(flagged), "new:", len(new_flags))
sys.exit(1 if (new_flags and not WRITE) else 0)
