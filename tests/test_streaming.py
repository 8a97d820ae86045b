"""Streaming-specific checks beyond oracle parity (SURVEY.md §5.3.2/.3).

The SQL-checked streaming queries are covered by test_parity.py; here we
check the watermark-dependent X4 query's containment property (its emission
set is replay-order sensitive, so it has no hash oracle) and that the batch
twin of the tumbling window agrees with the streaming result — the
streaming ≡ batch equivalence the whole §2.9 strategy rests on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data__instagram_analysis_spark.io import load
from big_data__instagram_analysis_spark.registry import get_specs


def _batch_tumbling(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes"), "event_type")
        .count()
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            F.col("count").alias("n"),
        )
    )


def test_watermark_append_subset_of_batch(spark, sf_dir):
    """X4: every append-mode-emitted window is a batch window with the same
    count (watermark may withhold/drop windows, never corrupt them), and the
    multi-trigger replay emits at least one finalized window."""
    from big_data__instagram_analysis_spark.queries.streaming import (
        _watermark_emitted_rows,
    )

    emitted = {
        (r["win_start"], r["event_type"]): r["n"]
        for r in _watermark_emitted_rows(spark, sf_dir).collect()
    }
    batch = {
        (r["win_start"], r["event_type"]): r["n"]
        for r in _batch_tumbling(spark, sf_dir).collect()
    }
    assert emitted, "multi-trigger replay should finalize at least one window"
    for key, n in emitted.items():
        assert key in batch, f"streaming emitted unknown window {key}"
        assert n <= batch[key], f"emitted count exceeds batch for {key}"


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    """X1 complete-mode streaming result == batch twin, row for row."""
    spec = get_specs()["stream_tumbling_counts"]
    got = sorted(map(tuple, spec.fn(spark, sf_dir).collect()))
    want = sorted(map(tuple, _batch_tumbling(spark, sf_dir).collect()))
    assert got == want


def test_dedup_ttl_bounds_and_determinism(spark, sf_dir):
    """TTL dedup output sits between exact distinct (floor: infinite
    state) and raw counts (ceiling: no dedup), and is deterministic for
    a fixed replay layout."""
    from big_data__instagram_analysis_spark.io import load
    from big_data__instagram_analysis_spark.registry import get_specs

    from big_data__instagram_analysis_spark.queries.streaming import (
        _ttl_dedup_kept_counts,
    )

    a = {
        r["event_type"]: r["n_kept"]
        for r in _ttl_dedup_kept_counts(spark, sf_dir).collect()
    }
    b = {
        r["event_type"]: r["n_kept"]
        for r in _ttl_dedup_kept_counts(spark, sf_dir).collect()
    }
    assert a == b, "replay with identical layout must be deterministic"
    e = load(spark, sf_dir, "events")
    raw = {r["event_type"]: r["n"] for r in
           e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    floor = {r["event_type"]: r["n"] for r in
             e.select("user_id", "event_type").distinct()
              .groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    for et, kept in a.items():
        assert floor[et] <= kept <= raw[et], (et, floor[et], kept, raw[et])
