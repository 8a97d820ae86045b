"""Round-trip helpers for the source/sink surface (SURVEY.md §2.1 S2-S7).

All writes go under the repo-local scratch dir, namespaced by query name and
scale factor so concurrent tiers never collide. Every writer uses
mode=overwrite — sinks are idempotent re-runs, the 100 TB-friendly default
for reproducible pipelines.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..io import scratch_dir


def sink_path(name: str, sf_dir: str) -> str:
    tier = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(scratch_dir(os.path.join(name, tier)))


def roundtrip_csv(
    df: DataFrame, spark: SparkSession, name: str, sf_dir: str
) -> DataFrame:
    """Write CSV with header, read back with the SAME explicit schema
    (header inference would widen ints and lose types)."""
    path = sink_path(name, sf_dir)
    df.write.mode("overwrite").csv(path, header=True)
    return spark.read.csv(path, header=True, schema=df.schema)


def roundtrip_json(
    df: DataFrame, spark: SparkSession, name: str, sf_dir: str
) -> DataFrame:
    path = sink_path(name, sf_dir)
    df.write.mode("overwrite").json(path)
    return spark.read.json(path, schema=df.schema)


def roundtrip_parquet(
    df: DataFrame, spark: SparkSession, name: str, sf_dir: str
) -> DataFrame:
    path = sink_path(name, sf_dir)
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def roundtrip_partitioned(
    df: DataFrame,
    spark: SparkSession,
    name: str,
    sf_dir: str,
    partition_col: str,
) -> DataFrame:
    """Hive-style partitioned sink (S7) — the layout that gives partition
    pruning on re-read at scale — then read the whole dataset back."""
    path = sink_path(name, sf_dir)
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    return spark.read.parquet(path)


def roundtrip_orc(
    df: DataFrame, spark: SparkSession, name: str, sf_dir: str
) -> DataFrame:
    """ORC sink → ORC source. Columnar like parquet (stripe/footer stats →
    predicate pushdown); exercises the second columnar format the engine
    declares."""
    path = sink_path(name, sf_dir)
    df.write.mode("overwrite").orc(path)
    return spark.read.orc(path)


def roundtrip_text(
    df_one_string_col: DataFrame, spark: SparkSession, name: str, sf_dir: str
) -> DataFrame:
    """text sink (one string column → one line per row) → text source
    (`value` column). The raw-corpus ingestion format: line-delimited UTF-8
    with no schema, split across files at partition granularity."""
    path = sink_path(name, sf_dir)
    df_one_string_col.write.mode("overwrite").text(path)
    return spark.read.text(path)
