"""As-of join (SURVEY.md §2.3 J8, §7.4 hard item #1).

Spark has no native as-of join. This implements it as a pure DataFrame
composition — union + last-value window — rather than ``merge_asof`` inside
``applyInPandas``: no Python in the path, O(n log n) via one shuffle+sort on
(key, ts), and it inherits AQE skew handling. The pattern:

    1. Tag left rows side=1, right rows side=0; union by name with
       null-filling (each side's payload is NULL on the other).
    2. Window per key ordered by (ts, side): right rows sort before left
       rows at equal ts, giving the  right_ts <= left_ts  as-of semantic.
    3. For every right payload column, last(col, ignorenulls) over
       rows(unboundedPreceding → current) carries the latest right value
       onto each left row.
    4. Keep left rows; 'inner' drops left rows with no prior right row.

Right rows must be unique per (key, ts) for determinism — pre-aggregate the
right side (e.g. arg-max) before calling; ties would otherwise resolve by
union order, which neither Spark nor any oracle guarantees.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    right_key: str | None = None,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    how: str = "inner",
    tolerance: int | None = None,
) -> DataFrame:
    """For each left row, attach the right payload with the greatest
    right_ts <= left_ts in the same key group.

    Returns left's columns plus ``payload`` columns (NULL when unmatched and
    how='left'; unmatched rows dropped when how='inner').

    ``tolerance`` (same units as the ts columns) bounds the lookback, like
    pandas merge_asof's tolerance: a right row older than
    ``left_ts - tolerance`` no longer counts as a match — the attribution-
    window semantic. Implemented by carrying the matched right timestamp
    through the same window pass, so the bound costs zero extra shuffles.
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    rk = right_key or key

    l_tagged = left.withColumn("__t", F.col(left_ts)).withColumn(
        "__side", F.lit(1)
    )
    r_tagged = right.select(
        F.col(rk).alias(key),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *payload,
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried: list[Column] = [
        F.last(c, ignorenulls=True).over(w).alias(c) for c in payload
    ]
    # Matched = a right row exists at-or-before this row, independently of
    # whether its payload values are NULL (a NULL payload is a valid match).
    matched = F.last(
        F.when(F.col("__side") == 0, F.lit(1)), ignorenulls=True
    ).over(w)
    if tolerance is not None:
        # Carry the matched right row's timestamp; a match outside the
        # lookback window is demoted to no-match (payload nulled for
        # how='left', row dropped for how='inner').
        right_t = F.last(
            F.when(F.col("__side") == 0, F.col("__t")), ignorenulls=True
        ).over(w)
        within = right_t.isNotNull() & (
            (F.col("__t") - right_t) <= F.lit(tolerance)
        )
        matched = F.when(within, F.lit(1))
        carried = [
            F.when(within, F.last(c, ignorenulls=True).over(w)).alias(c)
            for c in payload
        ]
    enriched = unioned.select(
        *[c for c in unioned.columns if c not in payload],
        *carried,
        matched.alias("__matched"),
    )

    out = enriched.where(F.col("__side") == 1)
    if how == "inner":
        out = out.where(F.col("__matched").isNotNull())
    return out.drop("__t", "__side", "__matched")
