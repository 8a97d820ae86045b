"""Spark-free helpers for tools/drive_driver.py, importable by unit tests.

VERDICT r11 #5: ``--only`` is a regex but reads like a comma list; a
comma-joined invocation used to silently match 0 queries and print
``FAILS: 0``. The filter logic lives here so tests/test_tools.py can pin
the zero-match error without paying a SparkSession.
"""
from __future__ import annotations

import re


def filter_only(qs: dict, only: str) -> tuple[dict, str | None]:
    """Apply the --only regex; return (filtered, error_message_or_None).

    A zero-match filter is an ERROR, not an empty-but-green run. When the
    pattern contains commas the message points at the '|' alternation form,
    the mistake that motivated this guard (a comma list matches nothing).
    """
    pat = re.compile(only)
    filtered = {n: f for n, f in qs.items() if pat.search(n)}
    if filtered:
        return filtered, None
    msg = f"--only {only!r} matched 0 of the registered queries"
    if "," in only:
        msg += " (it is a regex, not a comma list — join names with '|')"
    return filtered, msg
