"""Order-independent money aggregation.

The flake class this kills (found by the round-4 sf0.1 sweep,
PERF.md §35): ``round(sum(double), 2)`` depends on partial-aggregation
accumulation order — Spark's final-merge order follows shuffle fetch order,
which varies run to run, and DuckDB's parallel sum has the same property.
At group sums ≥ ~1e7 the reorder noise (~1e-12 relative) reaches the 2dp
rounding boundary window and the last cent flips nondeterministically
(star_join_profit and snapshot_diff_cdc were caught flipping; 49 registered
queries carried the pattern).

The fix: quantize each ADDEND to integer cents with ``floor(x*100 + 0.5)``
— floor is identical on both engines (no round-HALF_UP-vs-rint divergence,
and it works for negatives), the per-row double expression is deterministic
(same parquet bits, same IEEE ops, no accumulation), and a BIGINT sum is
exact and associative, so ANY accumulation order gives the same integer.
Dividing the identical integer by 100.0 yields identical double bits on
both engines, so the canonical ``repr`` strings match bit-exactly.

Semantics note: this is "sum of cents-quantized values", not "cents of the
double sum" — for 2-decimal money data they coincide; for the synthetic
fixtures' full-precision doubles they differ below the cent, which is
exactly the part that was nondeterministic noise before.

The SQL twin for oracles is :func:`cents_sum_sql`. At 100 TB the shape is
unchanged: one bigint per row into the same partial/final aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(e: Column | str) -> Column:
    """Per-row quantization to integer cents: floor(e*100 + 0.5) as BIGINT."""
    c = F.col(e) if isinstance(e, str) else e
    return F.floor(c * 100 + F.lit(0.5)).cast("bigint")


def cents_sum(e: Column | str) -> Column:
    """Deterministic money sum in currency units (see module docstring)."""
    return F.sum(cents(e)) / 100.0


def cents_sum_sql(expr: str) -> str:
    """DuckDB twin of :func:`cents_sum` for oracle strings."""
    return f"sum(CAST(floor(({expr}) * 100 + 0.5) AS BIGINT)) / 100.0"


def cents_avg4(e: Column | str) -> Column:
    """Deterministic 4-dp average of a 2-decimal money column.

    Exact BIGINT cents sum (see module docstring) scaled to 1e-4 units and
    emitted through the FLOOR form — floor(sum_cents·100/count + 0.5)/1e4 —
    NOT round(): a quantized ratio can land on an exact x.xxxx5 boundary,
    where Spark's HALF_UP (BigDecimal shortest-repr) and DuckDB's rint
    disagree (caught live on dsir doc 308, PERF §62). floor of identical
    IEEE inputs is identical on both engines and negative-safe.

    The denominator is the NON-NULL count of ``e`` (ADVICE r11) so the
    helper matches ``avg()`` semantics on a nullable column; the SQL twin
    counts the same expression. (NULL addends already contribute 0 to the
    sum on both engines — ``floor(NULL*100+0.5)`` is NULL and sum skips it.)
    """
    c = F.col(e) if isinstance(e, str) else e
    return F.floor(
        F.sum(cents(c)) * F.lit(100.0) / F.count(c) + F.lit(0.5)
    ) / F.lit(10000.0)


def cents_avg4_sql(expr: str) -> str:
    """DuckDB twin of :func:`cents_avg4` for oracle strings."""
    return (
        f"floor(sum(CAST(floor(({expr}) * 100 + 0.5) AS BIGINT)) * 100.0"
        f" / count({expr}) + 0.5) / 10000.0"
    )
