"""Local differential-testing harness mirroring the driver's DuckDB oracle.

The driver runs every ``queries()[name]`` at sf0.01 and compares row count +
schema + order-insensitive value hash against ``oracle_sql()[name]`` run by
DuckDB on the same parquet (``__spark_entry__.py``). This module replicates
that check locally (any sf) so parity breaks surface in pytest before the
driver sees them.

Canonicalization: columns sorted by name, every value rendered to a
canonical string (floats via shortest round-trip repr, NULL/NaN unified,
dates as ISO dates, timestamps as ISO), rows sorted. Two results match iff
the sorted row lists are identical — i.e. bit-exact after the SURVEY.md §5.4
rounding conventions.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass

import duckdb
import numpy as np
import pandas as pd

from .io import TABLES, table_path

NULL = "∅"


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'"
        )
    return con


def _canon_value(v) -> str:
    if v is None:
        return NULL
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return NULL if math.isnan(f) else repr(f)
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, pd.Timestamp):
        if v is pd.NaT:
            return NULL
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if v is pd.NaT:
        return NULL
    try:
        if pd.isna(v):
            return NULL
    except (TypeError, ValueError):
        pass
    return str(v)


def canonical_rows(pdf: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(
        tuple(_canon_value(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )
    return cols, rows


@dataclass
class ParityResult:
    name: str
    ok: bool
    spark_rows: int
    duck_rows: int
    mismatches: list[str]

    def summary(self) -> str:
        status = "OK " if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} duck={self.duck_rows}"
        if self.mismatches:
            msg += "\n  " + "\n  ".join(self.mismatches[:12])
        return msg


def compare_frames(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> ParityResult:
    mismatches: list[str] = []
    s_cols, s_rows = canonical_rows(spark_pdf)
    d_cols, d_rows = canonical_rows(duck_pdf)
    if s_cols != d_cols:
        mismatches.append(f"columns differ: spark={s_cols} duck={d_cols}")
    if len(s_rows) != len(d_rows):
        mismatches.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")
    if not mismatches and s_rows != d_rows:
        shown = 0
        for i, (a, b) in enumerate(zip(s_rows, d_rows)):
            if a != b:
                mismatches.append(f"row {i}: spark={a} duck={b}")
                shown += 1
                if shown >= 8:
                    break
    return ParityResult(name, not mismatches, len(s_rows), len(d_rows), mismatches)


def check_query(name: str, spark, sf_dir: str, con=None) -> ParityResult:
    """Run one registered query on Spark and its oracle on DuckDB; compare."""
    from .registry import get_specs

    spec = get_specs()[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        return ParityResult(name, True, len(spark_pdf), -1, [])
    own_con = con is None
    if own_con:
        con = duck_connect(sf_dir)
    try:
        duck_pdf = con.execute(spec.oracle).fetchdf()
    finally:
        if own_con:
            con.close()
    return compare_frames(name, spark_pdf, duck_pdf)
