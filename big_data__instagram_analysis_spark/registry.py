"""Query registry: pairs every Spark query with its DuckDB oracle SQL.

Each operator row from SURVEY.md §2 becomes one named entry created with the
:func:`query` decorator. The driver contract (``__spark_entry__.py``) exposes
``queries()`` (name → callable(spark, sf_dir) → DataFrame) and
``oracle_sql()`` (name → ANSI SQL for DuckDB over the same parquet views).

Hash-parity rules enforced by convention here (SURVEY.md §5.4):
  - every float aggregate is ROUNDed identically on both sides;
  - every column is aliased identically on both sides;
  - no raw ``events.ts`` in output (ns vs µs precision) — truncate first;
  - every LIMIT carries a unique total order (tiebreak keys);
  - integer SUMs are CAST to BIGINT in DuckDB (it widens to HUGEINT).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .session import tune

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None → driver records rows-only check
    category: str  # SURVEY.md §2 row id(s), e.g. "A1" / "L3"
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    *,
    oracle: str | None = None,
    category: str,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Register a named query. ``oracle`` is DuckDB SQL or None (rows-only)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        _REGISTRY[name] = QuerySpec(
            name=name,
            fn=wrapped,
            oracle=oracle.strip() if oracle else None,
            category=category,
            doc=(fn.__doc__ or "").strip(),
            tags=tags,
        )
        return fn

    return deco


def _ensure_loaded() -> None:
    # Importing the queries package triggers registration of every module.
    from . import queries  # noqa: F401


def get_specs() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return dict(_REGISTRY)


def get_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in get_specs().items()}


def get_oracles() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in get_specs().items() if spec.oracle is not None
    }
