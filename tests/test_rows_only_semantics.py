"""Semantic teeth for the rows-only lane (VERDICT r7 #6).

The five rows-only keys have no DuckDB oracle by declared design
(sketch estimates are impl-specific; streaming emission boundaries are
watermark-timing-dependent). The golden pins in test_goldens.py catch
DRIFT but would happily pin an already-wrong value, and the streaming
replay tests cover their three keys — this module adds the missing
accuracy/equivalence assertions that FAIL on a broken implementation:

  * q_agg_approx_distinct    — HLL estimate within its declared rsd of
                               the exact distinct count, per group;
  * q_agg_approx_quantile    — GK sketch values bracketed by the exact
                               percentiles at rank +/- tolerance;
  * stream_join_static       — the streamed windowed aggregate equals
                               the same aggregate computed in batch
                               (stream-static join loses no rows);
  * stream_watermark_late /
    stream_stream_join_outer — semantics asserted by the dedicated
                               replay tests (tests/test_streaming.py::
                               test_watermark_drops_late_replay and the
                               stream-stream join suite); this module
                               only pins that those keys still exist
                               and stay rows-only, so retiring a replay
                               test without replacing the signal shows
                               up here.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from jsmr_spark.compat import cents
from jsmr_spark.queries.common import t
from jsmr_spark.registry import all_specs, get_query

from tests.conftest import SF_DIR

# Declared accuracy of the approx_count_distinct call in the key.
HLL_RSD = 0.02
# GK accuracy=1000 bounds rank error by n/1000; we bracket with a
# comfortably wider +/- 2-percentile window.
GK_RANK_TOL = 0.02


def test_approx_distinct_tracks_exact(spark):
    approx = {
        r["l_returnflag"]: r["approx_nd_part"]
        for r in get_query("q_agg_approx_distinct").fn(spark, SF_DIR).collect()
    }
    exact = {
        r["l_returnflag"]: r["nd"]
        for r in (
            t(spark, SF_DIR, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.countDistinct("l_partkey").alias("nd"))
            .collect()
        )
    }
    assert set(approx) == set(exact)
    for k, est in approx.items():
        # 5 sigma of the declared 2% rsd — loose enough to never flake,
        # tight enough that a broken sketch (0, n_rows, wrong column)
        # fails immediately.
        assert abs(est - exact[k]) <= max(5 * HLL_RSD * exact[k], 2.0), (
            f"{k}: approx {est} vs exact {exact[k]}"
        )


def test_approx_quantile_bracketed_by_exact(spark):
    rows = get_query("q_agg_approx_quantile").fn(spark, SF_DIR).collect()
    li = t(spark, SF_DIR, "lineitem").select(
        "l_returnflag", cents(F.col("l_extendedprice")).alias("vc")
    )
    brackets = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr(
                f"percentile(vc, array({0.5 - GK_RANK_TOL}, {0.5 + GK_RANK_TOL},"
                f" {0.99 - GK_RANK_TOL}, 1.0))"
            ).alias("b")
        )
        .collect()
    }
    assert rows, "no groups returned"
    for r in rows:
        lo50, hi50, lo99, hi100 = brackets[r["l_returnflag"]]["b"]
        assert lo50 <= r["p50_cents"] <= hi50, (
            f"{r['l_returnflag']}: p50 {r['p50_cents']} outside [{lo50}, {hi50}]"
        )
        assert lo99 <= r["p99_cents"] <= hi100, (
            f"{r['l_returnflag']}: p99 {r['p99_cents']} outside [{lo99}, {hi100}]"
        )


def test_stream_join_static_equals_batch(spark):
    """The stream-static join topology must lose no rows: every window
    the stream emitted must carry exactly the batch-computed count, and
    the only batch windows it may omit are the ones the final watermark
    never closed (append mode cannot emit a window whose end the
    watermark has not passed — the documented rows-only reason)."""
    streamed = {
        tuple(r) for r in get_query("stream_join_static").fn(spark, SF_DIR).collect()
    }
    # Mirror the streaming query's graph in batch (same join key,
    # same 6-hour window, same output columns as
    # jsmr_spark/streaming/core.py:run_stream_static_join).
    ev = t(spark, SF_DIR, "events")
    dim = t(spark, SF_DIR, "customer").select(
        (F.col("c_custkey") - 1).alias("user_id"), "c_mktsegment"
    )
    batch = (
        ev.join(F.broadcast(dim), "user_id")
        .groupBy(F.window("ts", "6 hours").alias("w"), "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "c_mktsegment",
            "n_events",
        )
    )
    batch_rows = {tuple(r) for r in batch.collect()}
    assert streamed <= batch_rows, (
        f"stream emitted rows the batch join disproves: {streamed - batch_rows}"
    )
    # Anything the stream omitted must sit in the watermark-open tail.
    import datetime

    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    wm = max_ts - datetime.timedelta(minutes=10)
    for row in batch_rows - streamed:
        window_end = row[0] + datetime.timedelta(hours=6)
        assert window_end > wm, (
            f"closed window missing from the stream: {row} (end {window_end}, wm {wm})"
        )


@pytest.mark.parametrize(
    "name", ["stream_watermark_late", "stream_stream_join_outer"]
)
def test_streaming_rows_only_keys_still_covered(name):
    """These two stay rows-only BY DESIGN, and their semantics live in
    tests/test_streaming.py's replay assertions — keep the declaration
    honest so silently attaching a bogus oracle (or dropping the key)
    is caught here."""
    spec = all_specs()[name]
    assert spec.oracle is None, f"{name} grew an oracle; update the rows-only docs"
