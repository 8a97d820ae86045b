"""Every oracle must return rows at sf0.001 — the anti-vacuousness gate.

Round 3's zero-row audit (PERF.md §25) found three queries whose hash
checks had been green on EMPTY results since round 1 (a threshold above
the data's max similarity, a regex with no matches in the corpus, a date
tolerance across non-overlapping domains). An empty-vs-empty hash match
proves nothing, so this test closes the class: it evaluates every
registered oracle in DuckDB (milliseconds each — no Spark involved) and
fails registration of any query whose oracle is empty at sf0.001 OR
sf0.01 (both check tiers — the interval-overlap query proved a predicate
can be fine at one tier and degenerate at another). With hash parity
asserted elsewhere, a non-empty oracle implies a non-empty Spark result.

Queries whose EMPTINESS is the point (none today) would be listed in
ALLOWED_EMPTY with a justification.
"""

from __future__ import annotations

import duckdb
import pytest

from big_data__instagram_analysis_spark.registry import get_specs

ALLOWED_EMPTY: dict[str, str] = {}

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


_SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.fixture(scope="module", params=_SF_DIRS, ids=["sf0.001", "sf0.01"])
def duck_small(request):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{request.param}/{t}.parquet'"
        )
    yield con
    con.close()


def _oracle_names():
    return sorted(n for n, s in get_specs().items() if s.oracle is not None)


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_nonempty(name, duck_small):
    if name in ALLOWED_EMPTY:
        pytest.skip(ALLOWED_EMPTY[name])
    n = len(duck_small.execute(get_specs()[name].oracle).fetchall())
    assert n > 0, (
        f"{name}: oracle returns 0 rows at this SF — an empty-vs-empty hash "
        "match is vacuous; retune the query or justify it in ALLOWED_EMPTY"
    )
