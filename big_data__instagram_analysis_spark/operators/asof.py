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


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    right_key: str | None = None,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tolerance: int,
) -> DataFrame:
    """pandas merge_asof(direction='nearest'): attach the payload of the
    right row CLOSEST in time within ±tolerance; backward wins exact ties
    (pandas' rule). Unmatched left rows are dropped.

    Distributed form: a backward pass (asof_join as-is) plus a forward pass
    on the NEGATED integer time axis (greatest −t' ≤ −t ⇔ smallest t' ≥ t),
    then an argmin over the two candidate gaps — two (key, ts) window
    shuffles total, never a per-row range re-scan. ``left_ts``/``right_ts``
    must be integer-typed (negation must be exact).

    Returns left's columns plus ``payload`` and ``__gap`` (the winning
    absolute distance, same units as the ts columns). The left frame's
    non-ts columns must uniquely identify each row (the two directional
    passes re-join on them); pass a row id if they don't.
    """
    rk = right_key or key
    r = right.withColumnRenamed(rk, key) if rk != key else right

    b_pay = [f"__b_{c}" for c in payload]
    bwd = asof_join(
        left,
        r.select(
            key,
            right_ts,
            F.col(right_ts).alias("__b_ts"),
            *[F.col(c).alias(b) for c, b in zip(payload, b_pay)],
        ),
        key=key,
        left_ts=left_ts,
        right_ts=right_ts,
        payload=["__b_ts", *b_pay],
        how="left",
    )

    f_pay = [f"__f_{c}" for c in payload]
    fwd = asof_join(
        left.select(key, (-F.col(left_ts)).alias("__neg_t"), *[
            c for c in left.columns if c not in (key, left_ts)
        ]),
        r.select(
            key,
            (-F.col(right_ts)).alias("__neg_rt"),
            F.col(right_ts).alias("__f_ts"),
            *[F.col(c).alias(f) for c, f in zip(payload, f_pay)],
        ),
        key=key,
        left_ts="__neg_t",
        right_ts="__neg_rt",
        payload=["__f_ts", *f_pay],
        how="left",
    ).select(*[c for c in left.columns if c != left_ts], "__f_ts", *f_pay)

    join_keys = [c for c in left.columns if c != left_ts]
    both = bwd.join(fwd, join_keys)
    b_gap = F.col(left_ts) - F.col("__b_ts")
    f_gap = F.col("__f_ts") - F.col(left_ts)
    b_ok = F.col("__b_ts").isNotNull() & (b_gap <= tolerance)
    f_ok = F.col("__f_ts").isNotNull() & (f_gap <= tolerance)
    use_b = b_ok & (~f_ok | (b_gap <= f_gap))
    use_f = f_ok & ~use_b
    picked = [
        F.when(use_b, F.col(b)).otherwise(F.col(f)).alias(c)
        for c, b, f in zip(payload, b_pay, f_pay)
    ]
    return (
        both.where(use_b | use_f)
        .select(
            *left.columns,
            *picked,
            F.when(use_b, b_gap).otherwise(f_gap).alias("__gap"),
        )
    )
