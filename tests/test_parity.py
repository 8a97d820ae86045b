"""Differential test: every registered query vs its DuckDB oracle at sf0.001.

This mirrors the driver's t2 correctness gate (row count + schema + order-
insensitive value hash) so parity breaks fail here first.
"""

from __future__ import annotations

import pytest

from big_data__instagram_analysis_spark.oracle import check_query
from big_data__instagram_analysis_spark.registry import get_specs


def _sql_checked_names():
    return sorted(n for n, s in get_specs().items() if s.oracle is not None)


@pytest.mark.parametrize("name", _sql_checked_names())
def test_oracle_parity(name, spark, sf_dir, duck):
    res = check_query(name, spark, sf_dir, con=duck)
    assert res.ok, res.summary()


def _rows_only_names():
    return sorted(n for n, s in get_specs().items() if s.oracle is None)


@pytest.mark.parametrize("name", _rows_only_names())
def test_rows_only_runs(name, spark, sf_dir):
    spec = get_specs()[name]
    pdf = spec.fn(spark, sf_dir).toPandas()
    assert pdf is not None
