"""Unit tests for the Spark-free driver-tool helpers (tools/driver_util.py).

VERDICT r11 #5: ``drive_driver.py --only`` is a regex but reads like a comma
list; a comma-joined pattern used to silently match 0 queries and exit green.
These tests pin the zero-match error path without starting a SparkSession.
"""
import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "driver_util",
    os.path.join(os.path.dirname(__file__), "..", "tools", "driver_util.py"),
)
driver_util = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(driver_util)

QS = {"pricing_summary": 1, "join_revenue_by_nation": 2, "exact_dedup_docs": 3}


def test_only_regex_filters():
    got, err = driver_util.filter_only(QS, "dedup|pricing")
    assert err is None
    assert set(got) == {"pricing_summary", "exact_dedup_docs"}


def test_only_substring_match():
    got, err = driver_util.filter_only(QS, "revenue")
    assert err is None and set(got) == {"join_revenue_by_nation"}


def test_only_zero_match_is_error():
    got, err = driver_util.filter_only(QS, "no_such_query")
    assert got == {} and err is not None
    assert "matched 0" in err


def test_only_comma_list_suggests_alternation():
    # The motivating mistake: a comma-joined "list" matches nothing.
    got, err = driver_util.filter_only(QS, "pricing_summary,exact_dedup_docs")
    assert got == {} and err is not None
    assert "'|'" in err and "comma" in err
