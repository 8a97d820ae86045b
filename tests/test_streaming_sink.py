"""Checkpointed streaming file sink: exactly-once across restarts (S9/X8).

The memory-sink queries prove semantics; this proves the production sink
path: a parquet writeStream with a checkpoint, stopped and restarted, must
deliver every input row exactly once — the commit-log dedup that makes a
100 TB streaming ingest restartable. Also exercises the S7 shape (the sink
partitions by event_type).
"""

from __future__ import annotations

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
