"""Manual runtime Bloom-filter pruning (semi-join pre-filter).

The 100 TB pattern: before shuffling a huge fact table into a semi-join,
build a Bloom filter over the (much smaller) filtered dimension's keys and
apply it map-side on the fact scan. Rows failing the filter are dropped
*before* the shuffle; the exact join afterwards only sees survivors, so
false positives cost nothing but bandwidth and false negatives are
impossible by construction.

Spark ships this idea natively (`spark.sql.optimizer.runtime.bloomFilter.
enabled`, injected by the optimizer when statistics justify it); this module
implements it as an explicit, composable operator so a pipeline author can
force the pruning when they know the selectivity and the optimizer doesn't.

Everything stays JVM-side: the filter is BUILT with a distributed
`bit_or` aggregation over hashed bit positions, collected as a small
``array<bigint>`` (2 KB-256 KB — the dim side is small by assumption), and
APPLIED as a literal-array bit-test expression inside whole-stage codegen.
No Python runs per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Distinct seeds for the k hash functions (xxhash64 seed parameter).
_SEEDS = (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35, 0x27D4EB2F, 0x165667B1)


def build_bloom(keys: DataFrame, key_col: str, *, num_bits: int = 1 << 17,
                num_hashes: int = 3) -> list[int]:
    """Aggregate ``keys[key_col]`` into a Bloom bitset of ``num_bits`` bits.

    Distributed build: each key contributes ``num_hashes`` bit positions
    (``pmod(xxhash64(key, seed_i), num_bits)``); positions are grouped by
    64-bit word and OR-ed with ``bit_or`` (map-side partial → one tiny
    shuffle of ≤ num_bits/64 rows). Returns the dense word list.
    """
    if num_hashes > len(_SEEDS):
        raise ValueError(f"num_hashes > {len(_SEEDS)} not supported")
    pos_cols = [
        F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(num_bits))
        for seed in _SEEDS[:num_hashes]
    ]
    words = (
        keys.select(F.explode(F.array(*pos_cols)).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    dense = [0] * (num_bits // 64)
    for row in words:
        dense[row["word_idx"]] = row["word"]
    return dense


def might_contain(key: Column, words: list[int], *, num_bits: int,
                  num_hashes: int = 3) -> Column:
    """Bit-test expression: True iff every hash position's bit is set.

    ``words`` is embedded as one array literal (broadcast with the plan,
    like Spark's own runtime filter subquery result); each probe is
    ``element_at`` + ``&`` + compare — pure codegen, no shuffle, no Python.
    """
    tests = []
    arr = F.lit(words)
    one = F.lit(1).cast("bigint")
    for seed in _SEEDS[:num_hashes]:
        pos = F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(num_bits))
        word = F.element_at(arr, (pos / 64).cast("int") + F.lit(1))
        bit = F.call_function("shiftleft", one, (pos % 64).cast("int"))
        tests.append(word.bitwiseAND(bit) != F.lit(0))
    out = tests[0]
    for t in tests[1:]:
        out = out & t
    return out


def bloom_prune(fact: DataFrame, fact_key: str, dim_keys: DataFrame,
                dim_key: str, *, num_bits: int = 1 << 17,
                num_hashes: int = 3) -> DataFrame:
    """Drop fact rows whose key cannot be in ``dim_keys`` (no false negatives).

    The result still contains Bloom false positives — follow with an exact
    join (left_semi) for exact semantics; the pruning's job is only to keep
    non-matching rows out of that join's shuffle.
    """
    words = build_bloom(dim_keys, dim_key, num_bits=num_bits, num_hashes=num_hashes)
    return fact.filter(
        might_contain(F.col(fact_key), words, num_bits=num_bits, num_hashes=num_hashes)
    )
