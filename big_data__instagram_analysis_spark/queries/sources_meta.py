"""Advanced source-layer surface (§2.12 E124-E126): binaryFile ingestion,
``_metadata`` hidden file columns, and mergeSchema parquet evolution.

These close the last gaps between "can read the fixture tables" and "can
operate a 100 TB lakehouse layout": raw-binary corpus ingestion (the entry
point of every multimodal pipeline), file-level metadata without a side
channel (audit / incremental-load bookkeeping), and schema drift across
parquet batches written months apart.

Every query stages repo-local scratch data derived deterministically from a
fixture table, so the DuckDB oracle reproduces the result from the ORIGINAL
table — the round trip through the exotic source is what is being proven.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..numeric import cents_sum
from ..registry import query
from ..sources.readers_writers import sink_path


@query(
    "binary_file_source",
    category="S1,L7,E124",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha,
       TRUE AS is_file
FROM documents
WHERE doc_id < 40
ORDER BY doc_id
""",
)
def binary_file_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``binaryFile`` source: ingest opaque files as (path, length, content)
    rows — the first stage of any image/audio/document pipeline at 100 TB
    (the bytes stay executor-side; only metadata reaches the driver plan).

    Staging is fully distributed: 40 docs are base64-encoded (newline-proof)
    and written via a partitionBy(doc_id) text sink, producing one file per
    doc under ``doc_id=N/`` dirs. The binaryFile read then proves:
      - ``pathGlobFilter`` + ``recursiveFileLookup`` select only data files;
      - ``path`` carries the partition identity (regexp-extracted);
      - ``content`` is the exact bytes (sha256 of the decoded payload
        matches the oracle's sha256 over the original text).

    Scale note: binaryFile caps per-file content at
    spark.sql.binaryFile.maxLength; real corpora pair it with metadata-only
    projection (drop `content`) so pruning happens before byte transfer.
    """
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    staged = d.select(
        "doc_id", F.base64(F.encode("text", "UTF-8")).alias("b64")
    )
    path = sink_path("binfile_docs", sf_dir)
    staged.write.mode("overwrite").partitionBy("doc_id").text(path)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .option("recursiveFileLookup", "true")
        .load(path)
    )
    payload = F.unbase64(F.rtrim(F.decode(F.col("content"), "UTF-8")))
    return (
        files.select(
            F.regexp_extract("path", r"doc_id=(\d+)", 1).cast("bigint").alias("doc_id"),
            F.length(payload).cast("bigint").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha"),
            (F.col("length") > 0).alias("is_file"),
        )
        .orderBy("doc_id")
    )


@query(
    "metadata_hidden_columns",
    category="S1,S7,E125",
    oracle="""
SELECT o_orderstatus, count(*) AS n,
       sum(CAST(floor((o_totalprice) * 100 + 0.5) AS BIGINT)) / 100.0 AS total,
       TRUE AS is_parquet, TRUE AS nonempty_file
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def metadata_hidden_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``_metadata`` hidden file columns: per-file provenance without a side
    channel. After a partitionBy(o_orderstatus) parquet sink, the re-read
    selects ``_metadata.file_path`` / ``file_name`` / ``file_size`` alongside
    data columns — the audit/incremental-bookkeeping primitive (which file
    did this row come from, when was it written, how big is it).

    The status is recovered FROM the file path (not the inferred partition
    column), proving path↔partition agreement; the certified booleans pin
    that every row's file is a non-empty ``*.parquet``. At 100 TB the same
    projection drives file-level dedup/compaction decisions and costs
    nothing: _metadata is populated from the scan's own file listing.
    """
    o = load(spark, sf_dir, "orders")
    path = sink_path("meta_orders", sf_dir)
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    back = spark.read.parquet(path).select(
        "o_totalprice",
        F.regexp_extract(F.col("_metadata.file_path"), r"o_orderstatus=([^/]+)", 1)
        .alias("o_orderstatus"),
        F.col("_metadata.file_name").alias("fname"),
        F.col("_metadata.file_size").alias("fsize"),
    )
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            cents_sum(F.col("o_totalprice")).alias("total"),
            F.every(F.col("fname").endswith(".parquet")).alias("is_parquet"),
            F.every(F.col("fsize") > 0).alias("nonempty_file"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "parquet_schema_evolution",
    category="S1,S5,E126",
    oracle="""
SELECT coalesce(CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END,
                '<pre-evolution>') AS pri,
       count(*) AS n,
       sum(CAST(floor((o_totalprice) * 100 + 0.5) AS BIGINT)) / 100.0 AS total
FROM orders
GROUP BY 1
ORDER BY pri
""",
)
def parquet_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mergeSchema``: read parquet batches written with DIFFERENT schemas
    as one table. Batch 1 (even orderkeys) has (o_orderkey, o_totalprice);
    batch 2 (odd) adds o_orderpriority. A mergeSchema read unions the
    footers into the superset schema and fills NULL for the missing column —
    the schema-drift reality of any long-lived ingest directory.

    Scale note: mergeSchema reads every file footer at planning time, which
    is why it is opt-in; production layouts pin the superset schema in a
    catalog once drift is discovered. The read uses recursiveFileLookup
    (plain subdirs, not key=value partition layout).
    """
    o = load(spark, sf_dir, "orders")
    path = sink_path("evolve_orders", sf_dir)
    o.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    ).write.mode("overwrite").parquet(os.path.join(path, "batch1"))
    o.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    ).write.mode("overwrite").parquet(os.path.join(path, "batch2"))
    merged = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )
    return (
        merged.groupBy(
            F.coalesce("o_orderpriority", F.lit("<pre-evolution>")).alias("pri")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            cents_sum(F.col("o_totalprice")).alias("total"),
        )
        .orderBy("pri")
    )


# --- E200: whole-catalog health dashboard ------------------------------------

_HEALTH_TABLES = [
    ("region", "r_regionkey"),
    ("nation", "n_nationkey"),
    ("customer", "c_custkey"),
    ("supplier", "s_suppkey"),
    ("part", "p_partkey"),
    ("orders", "o_orderkey"),
    ("lineitem", "l_orderkey"),
    ("events", "event_id"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
]

_HEALTH_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{t}' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST({k} AS BIGINT)) AS BIGINT) AS key_sum,
       CAST(count(*) - count({k}) AS BIGINT) AS null_keys
FROM {t}"""
    for t, k in _HEALTH_TABLES
) + "\nORDER BY tbl"


@query("catalog_health_dashboard", category="S1,E200", oracle=_HEALTH_ORACLE)
def catalog_health_dashboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-catalog health check: one plan scans all ten fixture tables
    and emits per-table row count, key-sum checksum, and null-key count —
    the data-quality dashboard every warehouse runs nightly, and a
    pipeline-level smoke that any table drift (lost rows, NULLed keys,
    re-keyed fixtures) flips the hash.

    Scale: ten parallel single-column scans, each pruned to its key
    (ReadSchema is one column per table), each a map-side partial agg to
    one row — the plan's width is free parallelism, its depth is one
    exchange per table for the 1-row finals. The key-sum is an exact
    BIGINT checksum (keys are bounded, no overflow at any fixture SF).
    """
    from ..io import load as _load

    parts = []
    for t, k in _HEALTH_TABLES:
        df = _load(spark, sf_dir, t)
        parts.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col(k).cast("bigint")).alias("key_sum"),
                (F.count(F.lit(1)) - F.count(k)).alias("null_keys"),
            ).select(F.lit(t).alias("tbl"), "n_rows", "key_sum", "null_keys")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("tbl")
