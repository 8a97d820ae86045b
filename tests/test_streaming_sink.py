"""Checkpointed streaming file sink: exactly-once across restarts (S9/X8).

The memory-sink queries prove semantics; this proves the production sink
path: a parquet writeStream with a checkpoint, stopped and restarted, must
deliver every input row exactly once — the commit-log dedup that makes a
100 TB streaming ingest restartable. Also exercises the S7 shape (the sink
partitions by event_type).
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import functions as F

from big_data__instagram_analysis_spark.io import load, scratch_dir
from big_data__instagram_analysis_spark.streaming.harness import events_stream


def test_foreach_batch_sink_sees_every_row_once(spark, sf_dir):
    """S9 foreachBatch: per-micro-batch callback with (df, epoch_id).

    foreachBatch is the escape hatch for sinks Spark lacks natively (JDBC
    upserts, dedup-merge). The contract tested: across an availableNow
    replay, the callbacks collectively see every input row exactly once and
    epoch ids strictly increase.
    """
    seen: dict[int, int] = {}

    def sink(batch_df, epoch_id: int):
        seen[int(epoch_id)] = batch_df.count()

    s = events_stream(spark, sf_dir, max_files_per_trigger=3)
    q = (
        s.select("event_id", "value")
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()

    total = load(spark, sf_dir, "events").count()
    assert sum(seen.values()) == total
    assert len(seen) >= 2, "maxFilesPerTrigger=3 over 8 files should give ≥2 batches"
    assert sorted(seen) == list(seen), "epoch ids must arrive in order"


def test_checkpointed_parquet_sink_is_exactly_once(spark, sf_dir):
    out_dir = scratch_dir("stream_sink_test/out")
    ckpt_dir = scratch_dir("stream_sink_test/ckpt")
    shutil.rmtree(out_dir, ignore_errors=True)
    shutil.rmtree(ckpt_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def run_once():
        s = events_stream(spark, sf_dir, max_files_per_trigger=3)
        q = (
            s.select("event_id", "event_type", "user_id", "value")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt_dir)
            .partitionBy("event_type")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(120)
        finally:
            q.stop()

    run_once()
    # Restart against the same checkpoint: no new input → no new rows, and
    # crucially no re-emission of already-committed batches.
    run_once()

    got = spark.read.parquet(out_dir)
    want = load(spark, sf_dir, "events")
    assert got.count() == want.count()
    assert got.select("event_id").distinct().count() == want.count(), (
        "restart duplicated rows past the checkpoint commit log"
    )
    # Partitioned layout (S7): one subdirectory per event_type.
    types = {r["event_type"] for r in want.select("event_type").distinct().collect()}
    subdirs = {d.split("=")[1] for d in os.listdir(out_dir) if d.startswith("event_type=")}
    assert subdirs == types


def test_interrupted_stream_resumes_exactly_once(spark, sf_dir):
    """Checkpoint-resume with data arriving BETWEEN runs: run 1 sees 3 of 8
    input files, stops; 5 more land; run 2 resumes from the same checkpoint
    and must process exactly the new files — no re-emission, no gaps.

    This is the crash-recovery contract at scale: the checkpoint's offset
    log (which files are committed) plus the sink's transaction log make the
    pair exactly-once across restarts.
    """
    src_all = events_stream(spark, sf_dir)  # materializes the 8-file replay dir
    key = hashlib.sha256(f"{os.path.abspath(sf_dir)}|8".encode()).hexdigest()[:12]
    replay_src = scratch_dir(f"stream_events_{key}")
    assert os.path.exists(os.path.join(replay_src, "_SPARK_GRAFT_READY"))
    parts = sorted(f for f in os.listdir(replay_src) if f.endswith(".parquet"))
    assert len(parts) == 8

    in_dir = scratch_dir("resume_test/in")
    out_dir = scratch_dir("resume_test/out")
    ckpt = scratch_dir("resume_test/ckpt")
    for d in (in_dir, out_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(in_dir, exist_ok=True)

    schema = src_all.schema

    def run_once():
        s = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "*.parquet")
            .parquet(in_dir)
        )
        q = (
            s.select("event_id", "user_id", "value")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(120)
        finally:
            q.stop()

    for f in parts[:3]:
        shutil.copy(os.path.join(replay_src, f), os.path.join(in_dir, f))
    run_once()
    n_first = spark.read.parquet(out_dir).count()
    assert 0 < n_first < load(spark, sf_dir, "events").count()

    for f in parts[3:]:
        shutil.copy(os.path.join(replay_src, f), os.path.join(in_dir, f))
    run_once()

    got = spark.read.parquet(out_dir)
    total = load(spark, sf_dir, "events").count()
    assert got.count() == total, "resume lost or duplicated a micro-batch"
    assert got.select("event_id").distinct().count() == total
