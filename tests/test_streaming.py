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


def test_eviction_demo_shapes_evict_state(spark, sf_dir):
    """VERDICT r8 task #5: the eviction evidence must break CI when it
    breaks, not just go stale in STREAM_STATE.json. Runs the metrics
    tool's demo shapes (production 1-h watermarks over the sentinel
    replay) and asserts state is actually REMOVED, nothing is dropped
    late (the n_base_files=1 replay makes zero-drops a property, not an
    accident — ADVICE r8), and the state-rows trajectory decays from its
    peak."""
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "stream_state_metrics", os.path.join(repo, "tools", "stream_state_metrics.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    demos = mod.run_eviction_demos(spark, sf_dir)
    assert set(demos) == {
        "stream_stream_join_1h_watermark",
        "tumbling_agg_1h_watermark",
    }
    for name, rec in demos.items():
        assert rec.get("rows_removed_total", 0) > 0, (name, rec)
        assert rec.get("rows_dropped_by_watermark", 0) == 0, (name, rec)
        traj = rec.get("state_rows_trajectory", [])
        assert traj, name
        peak = max(t["rows_total"] for t in traj)
        assert traj[-1]["rows_total"] < peak, (name, traj)


def test_declared_ttl_join_certifies_eviction(spark, sf_dir):
    """The DECLARED stream_stream_join_ttl query (E247) must observe its
    own eviction: certified column TRUE on every row, sink equal to the
    batch attribution join, and the progress record behind the
    certificate showing removals with zero late drops."""
    from big_data__instagram_analysis_spark.streaming import harness

    harness.reset_progress_log()
    out = get_specs()["stream_stream_join_ttl"].fn(spark, sf_dir).toPandas()
    assert len(out) > 0
    assert out["state_evicted_no_drops"].all()

    rec = harness.PROGRESS_LOG[-1]
    assert rec["rows_removed_total"] > 0, rec
    assert rec["rows_dropped_by_watermark"] == 0, rec
    traj = rec["state_rows_trajectory"]
    assert traj[-1]["rows_total"] < max(t["rows_total"] for t in traj), traj

    # sink == batch twin (the hash gate proves this vs DuckDB; assert the
    # Spark-side equivalence here so the pytest suite stands alone)
    e = load(spark, sf_dir, "events")
    v = e.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("v_ts")
    )
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    batch = v.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    assert len(out) == batch.count()
