"""Salted join for skewed keys (SURVEY.md §4 skew playbook, made concrete).

When one join key carries a disproportionate share of rows, a plain
shuffle join sends the whole hot key to ONE task. AQE's skew-join splitting
handles moderate skew automatically; salting is the explicit rewrite for the
extreme case (or for engines/paths AQE doesn't cover, e.g. streaming joins):

  - LEFT (big, skewed): add salt = pmod(<uniform per-row expr>, n) — spreads
    each hot key over n tasks. The expr must be deterministic (parity!) and
    uniform; a unique id column is ideal.
  - RIGHT (smaller): replicate every row n times with salt 0..n-1 via a
    posexplode of an n-element array.
  - Join on (key, salt): same output as the plain join, n× the key space.

Cost model: right side inflates n×, so choose n ≈ (hot-key rows / target
rows-per-task) and salt only when the right side is far smaller than the hot
key's row count — exactly the events⋈user-dim shape demonstrated here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    salt_expr: Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join left⋈right on `key`, salted over n_salts sub-keys.

    ``salt_expr`` must be a deterministic, roughly-uniform integer expression
    over LEFT's columns (e.g. a unique id). Output == plain join output.
    """
    l_salted = left.withColumn("__salt", F.pmod(salt_expr, F.lit(n_salts)).cast("int"))
    r_salted = right.select(
        "*", F.posexplode(F.array(*[F.lit(i) for i in range(n_salts)]))
    ).drop("col").withColumnRenamed("pos", "__salt")
    out = l_salted.join(r_salted, on=[key, "__salt"], how=how)
    return out.drop("__salt")
