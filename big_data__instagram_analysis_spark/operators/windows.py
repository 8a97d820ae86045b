"""Window-frame decompositions that replace Spark's O(n·w) sliding frames.

Spark's SlidingWindowFunctionFrame carries no aggregate retraction: a
two-sided RANGE frame (``RANGE BETWEEN x PRECEDING AND x FOLLOWING``)
re-aggregates its entire frame for every row, O(n·w) per partition
(PERF.md §41 measured 5.9 s vs DuckDB's 0.11 s segment tree at sf0.1,
w≈1,200). The scale path is the classic prefix-sum identity

    band(v) = prefix(v + radius) − prefix(< v − radius)

computed from ONE incremental running window (Spark's
UNBOUNDED-PRECEDING frame IS O(1)/row), which turns the O(n·w) frame
scan into a plain O(n log n) sort.

`two_sided_value_band` is the reusable operator form; the registered
query `value_band_prefix_totals` (queries/windows.py, E220) is its
fixture instantiation, hash-equal to the RANGE-frame demo
`value_range_frame_peers` (W6/E72) by construction —
tests/test_windows_prefix.py pins row equality at two scale factors, a
hand-built boundary fixture, a Hypothesis brute-force differential, and
the no-sliding-frame plan shape.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["two_sided_value_band"]


def two_sided_value_band(
    df: DataFrame,
    *,
    id_col: str,
    partition_by: Sequence[str],
    value_col: str,
    radius: float,
    contribs: Mapping[str, Column],
) -> DataFrame:
    """Closed two-sided value-band aggregates without a sliding RANGE frame.

    For every input row r, over the rows s in the same ``partition_by``
    group with ``|s.value − r.value| <= radius`` (closed bounds on BOTH
    sides — exactly SQL's ``RANGE BETWEEN radius PRECEDING AND radius
    FOLLOWING``), returns the band row count and the band sum of each
    ``contribs`` column.

    Args:
        df: input frame; one output row is produced per input row.
        id_col: unique row key carried through (re-grouping key).
        partition_by: the window PARTITION BY columns.
        value_col: numeric ordering column the band is keyed on.
        radius: half-width of the band, in ``value_col`` units.
        contribs: {output_name: integer Column} — contributions summed
            over the band. Use exact integer encodings (cents, ppm) so the
            running sums are associative and engine-portable; the caller
            rescales on the way out.

    Returns:
        DataFrame with columns ``[id_col, *partition_by, value_col,
        band_n, *contribs]`` where ``band_n`` is the band row count
        (bigint) and each contrib column is its bigint band sum.

    Mechanics (why this is exact, not approximate): each input row emits
    its anchor row (key=value, tag=1, carrying the contributions) plus two
    zero-contribution probe rows (key=value−radius tag=0, key=value+radius
    tag=2). Sorting by (key, tag) places a lo-probe BEFORE anchors at the
    identical key (a row at exactly value−radius is inside the band, so it
    must not be subtracted) and a hi-probe AFTER anchors at the identical
    key (exactly value+radius is inside) — the closed bounds fall out of
    the tag order with no epsilon arithmetic. Probe keys use the same
    floating-point ``value ± radius`` a RANGE frame's bound comparison
    uses, so the boundary set is bit-identical to the frame form.

    Shape at scale: a 3n-row union of one pruned scan, one sort-shuffle on
    (partition_by, key, tag) for the running sums, one re-key shuffle on
    ``id_col`` to zip each row's two probes back together. No self-join,
    no O(n·w) frame recompute; both windows are UNBOUNDED-PRECEDING
    running frames, O(1) per row.
    """
    contribs = dict(contribs)
    reserved = {"_band_key", "_band_tag", "_band_n"}
    user_names = set(contribs) | {id_col, value_col, *partition_by}
    if reserved & user_names:
        raise ValueError(f"column names may not use the reserved names {reserved}")
    # Generated aliases (ADVICE r7): the probe stream carries value_col+"_out"
    # and the cumsum stage prefixes contrib names with "_cum_" — a user
    # column landing on either would produce a silently ambiguous plan.
    if (value_col + "_out") in user_names or any(
        n.startswith("_cum_") for n in user_names
    ):
        raise ValueError(
            f"column names may not equal {value_col + '_out'!r} or start "
            "with '_cum_' (internal probe/cumsum aliases)"
        )
    if set(contribs) & {id_col, value_col, *partition_by, "band_n"}:
        raise ValueError(
            "contrib output names collide with id/partition/value/band_n columns"
        )

    # Contributions are evaluated against the FULL input row (they may read
    # columns the band math itself doesn't carry), then everything else is
    # projected away so the 3n-row union stays narrow.
    base = df.withColumns(
        {name: col.cast("bigint") for name, col in contribs.items()}
    ).select(
        id_col,
        *partition_by,
        F.col(value_col).cast("double").alias(value_col),
        *contribs,
    )

    nul = F.lit(None)
    anchor_cols = [
        *partition_by,
        F.col(value_col).alias("_band_key"),
        F.lit(1).alias("_band_tag"),
        nul.cast(base.schema[id_col].dataType).alias(id_col),
        nul.cast("double").alias(value_col + "_out"),
        F.lit(1).cast("bigint").alias("_band_n"),
        *[F.col(name).alias(name) for name in contribs],
    ]
    anchors = base.select(*anchor_cols)

    def probe(tag: int, offset: float) -> DataFrame:
        return base.select(
            *partition_by,
            (F.col(value_col) + F.lit(offset)).alias("_band_key"),
            F.lit(tag).alias("_band_tag"),
            F.col(id_col).alias(id_col),
            F.col(value_col).alias(value_col + "_out"),
            F.lit(0).cast("bigint").alias("_band_n"),
            *[F.lit(0).cast("bigint").alias(name) for name in contribs],
        )

    stream = anchors.unionByName(probe(0, -radius)).unionByName(probe(2, radius))

    w = (
        Window.partitionBy(*partition_by)
        .orderBy("_band_key", "_band_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cums = stream.select(
        *partition_by,
        "_band_tag",
        id_col,
        value_col + "_out",
        F.sum("_band_n").over(w).alias("_cum__band_n"),
        *[F.sum(name).over(w).alias(f"_cum_{name}") for name in contribs],
    ).where(F.col("_band_tag") != 1)

    hi, lo = F.col("_band_tag") == 2, F.col("_band_tag") == 0

    def band(name: str) -> Column:
        c = F.col(f"_cum_{name}")
        return (F.max(F.when(hi, c)) - F.max(F.when(lo, c))).cast("bigint")

    return (
        cums.groupBy(id_col)
        .agg(
            *[F.max(p).alias(p) for p in partition_by],
            F.max(value_col + "_out").alias(value_col),
            band("_band_n").alias("band_n"),
            *[band(name).alias(name) for name in contribs],
        )
        .select(id_col, *partition_by, value_col, "band_n", *contribs)
    )
