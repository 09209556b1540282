"""Structured Streaming twins: replay equivalence with batch semantics
(SURVEY.md §5.2.6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from jsmr_spark.io import load_table
from jsmr_spark.registry import get_query
from jsmr_spark.streaming.core import (
    run_dedup_stream,
    run_tumbling_stream,
    run_watermark_late_replay,
)
from tests.conftest import SF_DIR


def test_tumbling_stream_matches_batch_prefix(spark):
    """Every window the stream emitted (watermark-closed) must carry
    exactly the batch counts; the stream may only be missing the tail
    windows still open at shutdown."""
    streamed = {
        (r.window_start, r.window_end, r.event_type): r.n
        for r in run_tumbling_stream(spark, SF_DIR).collect()
    }
    batch = {
        (r.window_start, r.window_end, r.event_type): r.n
        for r in get_query("q_stream_tumbling").fn(spark, SF_DIR).collect()
    }
    assert streamed, "stream emitted nothing"
    for key, n in streamed.items():
        assert batch.get(key) == n, f"window {key}: stream={n} batch={batch.get(key)}"
    # sanity: the stream saw most of the timeline
    assert len(streamed) >= 0.8 * len(batch)


def test_dedup_stream_drops_redelivered_chunks(spark):
    out = run_dedup_stream(spark, SF_DIR)
    n_events = load_table(spark, SF_DIR, "events").count()
    got = out.select("event_id").distinct().count()
    assert out.count() == got, "duplicates survived dedup"
    assert got == n_events


def test_watermark_drops_late_replay(spark):
    """The late tail replays the oldest 50 rows; none may be re-counted."""
    out = run_watermark_late_replay(spark, SF_DIR)
    emitted = {(r.window_start, r.window_end): r.n for r in out.collect()}
    batch = {
        (r.window_start, r.window_end): r.n
        for r in load_table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), "n")
        .collect()
    }
    assert emitted, "nothing emitted"
    for key, n in emitted.items():
        assert n <= batch[key], f"late rows double-counted in {key}"
