"""Multimodal-column queries (SURVEY.md §2.10 L7 + binary extension).

One row carries text + embedding + typed media metadata as nested structs;
the binary payload path runs through the Arrow-batched stubs in
operators/multimodal.py. Outputs are flattened to scalar columns so the
driver's pandas hash-compare sees plain values (structs don't hash portably).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..operators.multimodal import (
    FRAME_BYTES,
    FRAME_STRIDE,
    extract_features,
    frame_sample,
    with_media_struct,
)
from ..registry import query

# --- L7: pack text + embedding + metadata into one row -----------------------


@query(
    "multimodal_pack_project",
    category="L7",
    oracle="""
SELECT d.doc_id, d.lang,
       CAST(d.n_chars AS BIGINT) AS n_chars,
       CAST(len(e.embedding) AS INTEGER) AS emb_dim,
       round(sqrt(list_sum(list_transform(e.embedding,
                                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
             6) AS emb_norm
FROM documents d
JOIN embeddings e ON d.doc_id = e.vec_id
ORDER BY d.doc_id
""",
)
def multimodal_pack_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents⋈embeddings packed into a nested struct row, then projected.

    The pack is a broadcast-free 1:1 equi-join on the shared id (both sides
    hash-partition on it at scale); nested fields are projected back out via
    ``col.field`` paths, which Catalyst collapses — the struct never
    materializes columns the query doesn't read (ReadSchema pruning).
    """
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    packed = (
        d.join(e, d.doc_id == e.vec_id)
        .select(
            "doc_id",
            F.struct("text", "lang", "source", "n_chars").alias("content"),
            F.col("embedding").alias("embedding"),
        )
    )
    emb_d = F.transform("embedding", lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(
            F.transform(emb_d, lambda x: x * x), F.lit(0.0), lambda a, v: a + v
        )
    )
    return packed.select(
        "doc_id",
        F.col("content.lang").alias("lang"),
        F.col("content.n_chars").cast("long").alias("n_chars"),
        F.size("embedding").alias("emb_dim"),
        F.round(norm, 6).alias("emb_norm"),
    ).orderBy("doc_id")


# --- binary payload: decode-stub feature extraction --------------------------


@query(
    "multimodal_decode_features",
    category="L7,E10",
    oracle="""
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(64 + strlen(text) % 640 AS INTEGER) AS width,
       CAST(64 + (strlen(text) // 640) % 480 AS INTEGER) AS height
FROM documents
ORDER BY doc_id
""",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column → mapInPandas decode stub → typed feature row.

    DuckDB mirrors the deterministic fake decode from byte length (UTF-8
    strlen == octet_length of the encoded payload), proving the Arrow batch
    plumbing end-to-end while the codec itself stays stubbed.
    """
    docs = load(spark, sf_dir, "documents")
    return extract_features(with_media_struct(docs)).orderBy("doc_id")


# --- binary payload: 1→N frame sampling --------------------------------------


@query(
    "multimodal_frame_sample",
    category="L7,E10",
    oracle=f"""
WITH n AS (
  SELECT doc_id, strlen(text) // {FRAME_BYTES} AS n_frames
  FROM documents
)
SELECT doc_id,
       CAST(f AS INTEGER) AS frame_idx,
       CAST(f * {FRAME_BYTES} AS BIGINT) AS frame_off
FROM n, unnest(range(0, n_frames, {FRAME_STRIDE})) AS t(f)
ORDER BY doc_id, frame_idx
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: one media row fans out to n_frames/stride
    rows through a mapInPandas UDTF-shaped stage (schema-stable offsets)."""
    docs = load(spark, sf_dir, "documents")
    return frame_sample(with_media_struct(docs)).orderBy("doc_id", "frame_idx")
