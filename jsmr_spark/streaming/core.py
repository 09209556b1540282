"""Structured Streaming execution of the stream operators.

The batch keys in queries/streaming_batch.py define the semantics and
are oracle-checked; this module runs the SAME transformations under
MicroBatchExecution with a file source, so that watermarks, state
stores, and late-data policy are exercised for real:

  * events are staged to a temp directory as K ordered parquet chunk
    files (a deterministic replay of the stream, one file per trigger
    via maxFilesPerTrigger=1);
  * stateful aggregations run with withWatermark(); in append mode a
    window only emits once the watermark passes its end;
  * run_watermark_late_replay() appends a final chunk of deliberately
    old rows — the state store drops them, which is the watermark
    late-data contract (not expressible in batch; rows-only key).

At production scale the file source becomes Kafka and the memory sink
becomes a parquet/Delta sink — the query graph is unchanged. State
size is bounded by (watermark horizon x active keys), not stream
length.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jsmr_spark.io import load_table


def _replay_tmp_root() -> str:
    """Root for replay staging files and ephemeral checkpoints.

    Everything the replay harness writes is throwaway by construction
    (each runner rmtree's it in a finally), so it defaults to the
    RAM-backed tmpdir when one exists: the HDFS-backed state store
    commits one fsync'd delta file PER PARTITION PER STORE PER
    MICRO-BATCH (a stream-stream join carries 4 stores/partition), and
    on a disk-backed /tmp that fsync chain is the dominant cost of the
    replay tier — measured r13: commitTimeMs 600-800 ms summed per
    micro-batch on ext4 for the outer interval join. A real deployment
    checkpoints to durable storage ON PURPOSE; this is placement of a
    simulation's scratch space, not an engine setting, and
    $SPARK_GRAFT_STREAM_TMP overrides it."""
    env = os.environ.get("SPARK_GRAFT_STREAM_TMP")
    if env:
        return env
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        return shm
    return tempfile.gettempdir()


def _stage_chunks(spark: SparkSession, sf_dir: str, n_chunks: int, late_tail: bool) -> tuple[str, str, int]:
    """Write events as ordered parquet chunks simulating arrival order.

    Chunks 0..n-2 cover the stream in ascending ts order. If late_tail,
    the final chunk replays the OLDEST rows again (severely late data);
    otherwise it is just the last time-slice.
    """
    import glob as _glob
    import time as _time

    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    base = os.path.join(_replay_tmp_root(), f"jsmr_stream_{uuid.uuid4().hex[:8]}")
    src_dir = os.path.join(base, "src")
    os.makedirs(src_dir)
    n_main = n_chunks - 1 if late_tail else n_chunks
    # ONE Spark job (r12, guide §1.2 step 1): the old form ran
    # window+cache+count plus one filtered write job PER CHUNK (~9 jobs
    # per streaming key, the dominant fixed cost of the replay tier).
    # Chunk assignment is the same single-partition ntile window (the
    # replay is a bounded local harness by construction); the sorted
    # 1-partition write preserves rn order, and the per-chunk split is
    # driver-local pyarrow over that one small file — byte-identical
    # rows and ntile boundaries, zero extra Spark jobs. Arrival order is
    # pinned with EXPLICIT strictly-increasing mtimes (the file source
    # orders by modification time), which the sequential writes only
    # guaranteed implicitly.
    w = Window.orderBy("ts", "event_id")
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("chunk", F.ntile(n_main).over(w) - 1)
    )
    stage = os.path.join(base, "stage")
    # TIMESTAMP_MICROS so the pyarrow round trip is exact: the INT96
    # default reads back as ns and would re-write as TIMESTAMP(NANOS),
    # which the nanosAsLong session conf then scans as bigint.
    old_tt = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        ev.coalesce(1).write.parquet(stage)
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", old_tt)
    part = _glob.glob(os.path.join(stage, "part-*.parquet"))
    if len(part) != 1:
        # coalesce(1) guarantees a single part file; anything else would
        # silently stage a subset of rows below. Not an assert: those are
        # stripped under `python -O` (ADVICE r12).
        raise RuntimeError(f"expected exactly one staged part file, got {part}")
    tbl = _pq.read_table(part[0])
    n_rows = tbl.num_rows
    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    t0 = _time.time() - 2 * (n_chunks + 2)
    for i in range(n_main):
        p = os.path.join(src_dir, f"chunk_{i:03d}")
        _pq.write_table(tbl.filter(_pc.equal(tbl["chunk"], i)).select(cols), p)
        os.utime(p, (t0 + 2 * i, t0 + 2 * i))
    if late_tail:
        # Replay the oldest 50 rows after the watermark has advanced far
        # beyond them -> guaranteed drop.
        p = os.path.join(src_dir, f"chunk_{n_main:03d}")
        _pq.write_table(
            tbl.filter(_pc.less_equal(tbl["rn"], 50)).select(cols), p
        )
        os.utime(p, (t0 + 2 * n_main, t0 + 2 * n_main))
    shutil.rmtree(stage, ignore_errors=True)
    return base, src_dir, n_rows


class _replay_shuffle_clamp:
    """Clamp spark.sql.shuffle.partitions for the duration of a replay.

    AQE never applies to streaming queries, so every stateful operator
    materializes exactly `shuffle.partitions` state-store instances PER
    MICRO-BATCH. At replay scale (a handful of chunks, thousands of
    rows) the session's batch-sized setting is pure overhead; a real
    deployment sizes this once per stream at first start (the state
    partition count is then pinned by the checkpoint).

    INPUT-AWARE since round 6 (VERDICT r5 #7): a fixed clamp of 8 also
    capped the number of parallel Python workers for the stateful
    pandas lane, so the 10x probe saw wall ~ rows/8 instead of
    rows/cores. When the caller knows the staged row count, partitions
    scale ~rows/20k (bounded 4..32; r12 lowered the floor 8 -> 4: every
    stateful operator commits one state-store delta file PER PARTITION
    PER MICRO-BATCH, so the floor is pure per-batch commit overhead at
    fixture scale, while the probe scales — 1M rows still sizes to 32,
    the r6 input-aware fix unchanged) — exactly the once-per-stream
    sizing a real deployment does."""

    def __init__(self, spark: SparkSession, n_rows: int | None = None):
        self.spark = spark
        self.n = "4" if n_rows is None else str(min(32, max(4, n_rows // 20_000)))

    def __enter__(self):
        self.old = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", self.n)
        # Ephemeral checkpoint root for the replay's queries (r13): a
        # memory-sink query otherwise checkpoints to a temp dir under
        # java.io.tmpdir, which on a disk-backed /tmp pays the state
        # store's per-partition-per-store fsync chain every micro-batch
        # (see _replay_tmp_root). Runners that pass an explicit
        # checkpointLocation option (restart/CDC — their checkpoints
        # must live with the staged chunks) override this conf, which
        # is exactly Spark's precedence. Deleted on exit; queries
        # started inside the clamp are stopped inside it.
        self.ckpt = os.path.join(
            _replay_tmp_root(), f"jsmr_ckpt_{uuid.uuid4().hex[:8]}"
        )
        self.old_ckpt = self.spark.conf.get(
            "spark.sql.streaming.checkpointLocation", None
        )
        self.spark.conf.set("spark.sql.streaming.checkpointLocation", self.ckpt)

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.old)
        if self.old_ckpt is None:
            self.spark.conf.unset("spark.sql.streaming.checkpointLocation")
        else:
            self.spark.conf.set(
                "spark.sql.streaming.checkpointLocation", self.old_ckpt
            )
        shutil.rmtree(self.ckpt, ignore_errors=True)


def _run_stream(spark: SparkSession, src_dir: str, transform, query_name: str, n_rows: int | None = None) -> DataFrame:
    """Run a file-source stream through `transform` into a memory sink,
    one staged chunk per micro-batch, and return the final table."""
    schema = spark.read.parquet(os.path.join(src_dir, "chunk_000")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(os.path.join(src_dir, "chunk_*"))
    )
    out = transform(stream)
    with _replay_shuffle_clamp(spark, n_rows):
        q = (
            out.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    return spark.table(query_name)


def run_tumbling_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q_stream_tumbling (append mode, watermark-gated
    emission). With a closed input, emitted windows = batch windows for
    every window whose end precedes the final watermark."""
    base, src, n_rows = _stage_chunks(spark, sf_dir, n_chunks=8, late_tail=False)
    try:
        def transform(stream: DataFrame) -> DataFrame:
            return (
                stream.withWatermark("ts", "10 minutes")
                .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
                .agg(F.count(F.lit(1)).alias("n"))
                .select(
                    F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type",
                    "n",
                )
            )

        name = f"tumbling_{uuid.uuid4().hex[:8]}"
        return _run_stream(spark, src, transform, name, n_rows)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def run_sliding_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q_stream_sliding: 1-hour windows sliding every
    30 minutes under a watermark — each event enters TWO window states,
    so this exercises multi-window state fan-out (state rows = 2x keys,
    still watermark-bounded) that the tumbling replay does not."""
    base, src, n_rows = _stage_chunks(spark, sf_dir, n_chunks=8, late_tail=False)
    try:
        def transform(stream: DataFrame) -> DataFrame:
            return (
                stream.withWatermark("ts", "10 minutes")
                .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
                .agg(F.count(F.lit(1)).alias("n"))
                .select(
                    F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type",
                    "n",
                )
            )

        name = f"sliding_{uuid.uuid4().hex[:8]}"
        return _run_stream(spark, src, transform, name, n_rows)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def run_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q_stream_dedup: withWatermark + dropDuplicates
    over a replay where every chunk is delivered twice (at-least-once)."""
    base, src, n_rows = _stage_chunks(spark, sf_dir, n_chunks=4, late_tail=False)
    try:
        # duplicate each chunk to simulate redelivery; the explicit
        # mtime (+1s, between chunk i at +0 and chunk i+1 at +2s) pins
        # the redelivered copy ADJACENT to its original in the file
        # source's arrival order.
        for d in sorted(os.listdir(src)):
            sp, dp = os.path.join(src, d), os.path.join(src, d + "_redeliver")
            shutil.copy2(sp, dp)
            mt = os.stat(sp).st_mtime + 1
            os.utime(dp, (mt, mt))

        def transform(stream: DataFrame) -> DataFrame:
            return stream.withWatermark("ts", "1 hour").dropDuplicates(["event_id"]).select(
                "event_id", "user_id", "event_type", "ts"
            )

        name = f"dedup_{uuid.uuid4().hex[:8]}"
        return _run_stream(spark, src, transform, name, n_rows)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def run_dedup_within_wm_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup via dropDuplicatesWithinWatermark (Spark 3.5+):
    the state-BOUNDED exactly-once API. Plain dropDuplicates keeps a
    state row per key FOREVER unless the event-time column is part of
    the dedup key; WithinWatermark guarantees dedup only for duplicates
    arriving inside the watermark delay and EVICTS state the moment the
    watermark passes ts + delay — the only sustainable shape for an
    unbounded 100 TB stream keyed on event_id.

    Replay: every chunk is delivered twice (at-least-once redelivery,
    adjacent in arrival order). Each redelivered row is then either
    still inside the watermark window (deduped by live state) or
    older than the watermark (dropped as late) — so the closed-input
    output is EXACTLY the distinct original rows, fully hash-checkable,
    while state stays bounded by the delay instead of the key space."""
    base, src, n_rows = _stage_chunks(spark, sf_dir, n_chunks=4, late_tail=False)
    try:
        # redelivered copy adjacent in arrival order (see run_dedup_stream)
        for d in sorted(os.listdir(src)):
            sp, dp = os.path.join(src, d), os.path.join(src, d + "_redeliver")
            shutil.copy2(sp, dp)
            mt = os.stat(sp).st_mtime + 1
            os.utime(dp, (mt, mt))

        def transform(stream: DataFrame) -> DataFrame:
            return (
                stream.withWatermark("ts", "1 hour")
                .dropDuplicatesWithinWatermark(["event_id"])
                .select("event_id", "user_id", "event_type", "ts")
            )

        name = f"dedupwm_{uuid.uuid4().hex[:8]}"
        return _run_stream(spark, src, transform, name, n_rows)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def run_watermark_late_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data policy demonstration (rows-only key): tumbling counts
    with a 10-minute watermark over a replay whose final chunk re-sends
    the oldest rows. Those rows are beyond the watermark when they
    arrive and are dropped; the emitted counts therefore equal the
    batch counts of the on-time prefix.

    5 chunks (4 on-time + 1 late replay) keep the demonstration exact —
    the watermark has advanced past the whole stream before the late
    chunk arrives regardless of how finely the prefix is sliced — while
    keeping the per-micro-batch planning/state cost off the driver's
    correctness-sweep budget."""
    base, src, n_rows = _stage_chunks(spark, sf_dir, n_chunks=5, late_tail=True)
    try:
        def transform(stream: DataFrame) -> DataFrame:
            return (
                stream.withWatermark("ts", "10 minutes")
                .groupBy(F.window("ts", "1 hour").alias("w"))
                .agg(F.count(F.lit(1)).alias("n"))
                .select(
                    F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "n",
                )
            )

        name = f"late_{uuid.uuid4().hex[:8]}"
        return _run_stream(spark, src, transform, name, n_rows)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def run_session_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q_stream_session: session_window + watermark in
    append mode — sessions emit once the watermark passes their close."""
    base, src, n_rows = _stage_chunks(spark, sf_dir, n_chunks=8, late_tail=False)
    try:
        def transform(stream: DataFrame) -> DataFrame:
            return (
                stream.withWatermark("ts", "30 minutes")
                .groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
                .agg(F.count(F.lit(1)).alias("n_events"))
                .select(
                    "user_id",
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events",
                )
            )

        name = f"session_{uuid.uuid4().hex[:8]}"
        return _run_stream(spark, src, transform, name, n_rows)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _stateful_counter_transform(stream: DataFrame) -> DataFrame:
    """applyInPandasWithState transform shared by the single-run replay
    and the checkpoint-restart replay: cumulative per-user event count +
    exact cents spend, state-store-backed, emitted in update mode."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update_totals(key, pdfs, state: GroupState):
        (user_id,) = key
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int((pdf["value"] * 100).round().sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "spend": [cents / 100.0]}
        )

    return (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update_totals,
            outputStructType="user_id long, n_events long, spend double",
            stateStructType="n long, cents long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_stateful_counter_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: cumulative
    per-user event count + exact cents spend, updated every micro-batch.

    This is the escape hatch for stateful logic that session/tumbling
    windows cannot express (JsMr parity: arbitrary user reduce state,
    SURVEY.md §2.A A11) — user state lives in the state store, bounded
    by active keys, emitted in update mode each batch."""
    base, src, n_rows = _stage_chunks(spark, sf_dir, n_chunks=6, late_tail=False)
    try:
        transform = _stateful_counter_transform

        schema = spark.read.parquet(os.path.join(src, "chunk_000")).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "chunk_*"))
        )
        name = f"stateful_{uuid.uuid4().hex[:8]}"
        with _replay_shuffle_clamp(spark, n_rows):
            q = (
                transform(stream)
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.processAllAvailable()
            q.stop()
        return spark.table(name)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def run_stateful_counter_restart(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, int, int]:
    """Checkpoint-recovery proof for the stateful counter (VERDICT r3 #2):
    the stream is STOPPED MID-INGEST — only half the chunks have arrived —
    then a brand-new query object restarts from the same checkpoint dir
    once the rest of the data lands, and must resume exactly where the
    first incarnation left off: no re-emission of committed batches
    (no dupes), no skipped data (no loss).

    This is the production kill/restart path: the offset log pins which
    source files each batch consumed, and the HDFS-backed state store
    snapshots the per-user (n, cents) state per batch; a restart replays
    neither. A hard kill mid-batch additionally replays the one
    uncommitted batch — exactly-once into the state store, at-least-once
    into a non-idempotent sink — which is the documented Structured
    Streaming contract; the sink here (foreachBatch accumulator) only
    observes batch boundaries, so the clean-stop variant is the
    deterministic test of the same recovery machinery.

    Returns (phase1_emissions, phase2_emissions, n_prefix_rows,
    n_total_rows): everything the invariants need — phase-1 totals must
    account for exactly the prefix rows, and max-merged totals across
    both phases must account for exactly the whole table.
    """
    base, src, n_rows = _stage_chunks(spark, sf_dir, n_chunks=6, late_tail=False)
    try:
        # Hold back the last 3 chunks: phase 1 genuinely stops while the
        # logical stream still has data in flight.
        hold = os.path.join(base, "hold")
        os.makedirs(hold)
        chunks = sorted(d for d in os.listdir(src) if d.startswith("chunk_"))
        for d in chunks[3:]:
            shutil.move(os.path.join(src, d), os.path.join(hold, d))
        n_prefix = spark.read.parquet(os.path.join(src, "chunk_*")).count()

        ckpt = os.path.join(base, "ckpt")
        schema = spark.read.parquet(os.path.join(src, "chunk_000")).schema
        out_schema = "user_id long, n_events long, spend double"

        def run_incarnation() -> list:
            """Start a NEW query from the shared checkpoint; collect every
            emitted row via foreachBatch (the checkpoint-compatible sink —
            a memory sink cannot recover from a checkpoint location)."""
            emitted: list = []

            def sink(batch_df: DataFrame, _batch_id: int) -> None:
                emitted.extend(batch_df.collect())

            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(os.path.join(src, "chunk_*"))
            )
            q = (
                _stateful_counter_transform(stream)
                .writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            return emitted

        with _replay_shuffle_clamp(spark, n_rows):
            phase1 = run_incarnation()
            # the rest of the stream arrives while the query is down
            for d in chunks[3:]:
                shutil.move(os.path.join(hold, d), os.path.join(src, d))
            phase2 = run_incarnation()
        n_total = spark.read.parquet(os.path.join(src, "chunk_*")).count()
        return (
            spark.createDataFrame(phase1, out_schema),
            spark.createDataFrame(phase2, out_schema),
            n_prefix,
            n_total,
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def run_rate_source_stream(spark: SparkSession) -> DataFrame:
    """True UNBOUNDED source (not a file replay): rate-micro-batch
    generates a deterministic row sequence (value = 0,1,2,... with
    fixed timestamps), so this exercises the continuous-ingest wiring —
    an always-available source, complete-mode aggregation into a
    continuously-rewritten sink, and an explicit stop decision — while
    staying oracle-checkable: the transform filters to value < N before
    aggregating, so once N rows have been ingested the aggregate is a
    pure function of the counter sequence.

    At production scale this source swaps for Kafka and the stop
    condition disappears (the query runs forever); the query graph and
    state shape are identical. The memory sink's complete mode is the
    bounded-cardinality dashboard pattern (K user keys), not an
    unbounded append."""
    import time as _time

    n_rows, n_keys = 5000, 50
    stream = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 1000)
        .option("numPartitions", 4)
        .option("startTimestamp", 0)
        .load()
    )
    agg = (
        stream.filter(F.col("value") < n_rows)
        .groupBy((F.col("value") % n_keys).alias("user_key"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
    )
    name = f"rate_{uuid.uuid4().hex[:8]}"
    with _replay_shuffle_clamp(spark, n_rows):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .start()
        )
        try:
            done = None  # defined even if the poll loop never runs
            deadline = _time.time() + 120
            while _time.time() < deadline:
                # r13: cheap driver-local gate first — recentProgress
                # entries are appended after a batch (and its complete-
                # mode sink rewrite) commits, and the rate source emits
                # values sequentially, so >= n_rows cumulative input
                # implies every counted value has landed in the sink.
                # The old loop ran the confirming collect as a Spark
                # job every 0.2 s, competing with the micro-batches it
                # was waiting on; now the job runs only to confirm.
                ingested = sum(p.numInputRows for p in q.recentProgress)
                if ingested >= n_rows:
                    done = spark.table(name).agg(F.sum("n")).collect()[0][0]
                    if done == n_rows:
                        break
                _time.sleep(0.05)
            else:
                raise TimeoutError(
                    f"rate stream ingested {done} of {n_rows} rows in 120s"
                )
        finally:
            q.stop()
    return spark.table(name)


def run_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the event stream joins a static
    customer-derived dimension (user_id -> market segment) inside the
    streaming query, then aggregates windowed counts per segment.

    The static side is planned as a broadcast against every micro-batch
    — the canonical dimension-enrichment shape (at production scale:
    Kafka stream x broadcast dim table; state is only the windowed agg,
    bounded by watermark x segments)."""
    dim = (
        load_table(spark, sf_dir, "customer")
        .select((F.col("c_custkey") - 1).alias("user_id"), "c_mktsegment")
    )
    base, src, n_rows = _stage_chunks(spark, sf_dir, n_chunks=6, late_tail=False)
    try:
        def transform(stream: DataFrame) -> DataFrame:
            return (
                stream.withWatermark("ts", "10 minutes")
                .join(F.broadcast(dim), "user_id")
                .groupBy(F.window("ts", "6 hours").alias("w"), "c_mktsegment")
                .agg(F.count(F.lit(1)).alias("n_events"))
                .select(
                    F.col("w.start").alias("window_start"),
                    "c_mktsegment",
                    "n_events",
                )
            )

        name = f"stream_static_{uuid.uuid4().hex[:8]}"
        return _run_stream(spark, src, transform, name, n_rows)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def run_exactly_once_sink_stream(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, dict]:
    """Exactly-once FILE sink under a mid-stream sink failure: the
    production foreachBatch idempotence pattern, exercised with a real
    redelivery.

    Structured Streaming's contract is exactly-once into the state
    store but AT-LEAST-ONCE into an arbitrary sink: when a batch fails
    after the sink ran but before the checkpoint commit, the restart
    re-delivers that batch. A non-idempotent sink duplicates it; the
    standard fix is a batchId-keyed idempotent write — publish each
    batch to its own directory via write-to-tmp + atomic rename, and
    skip any batch directory that already exists.

    This harness PROVES the pattern: incarnation 1 processes the staged
    chunks one per micro-batch and the sink raises an injected failure
    for batch 2 AFTER its directory is published (the worst-case window:
    side effect done, offset commit lost). Incarnation 2 restarts from
    the same checkpoint; Structured Streaming re-delivers batch 2, the
    sink detects the published directory and skips the rewrite, and the
    stream runs to completion. The final sink contents must contain
    every input row exactly once — the registered key value-checks that
    against the batch aggregate (a duplicate batch 2 or a lost batch
    fails the hash).

    At production scale the tmp+rename publish becomes the object-store
    commit protocol or a transactional table format (Delta/Iceberg
    txn log keyed on (queryId, batchId) — same idempotence key); the
    query graph is unchanged.

    Returns (per_user_totals_df, evidence): evidence records the
    injected failure and the redelivery skip so tests can assert the
    failure path actually executed.
    """
    base, src, n_rows = _stage_chunks(spark, sf_dir, n_chunks=6, late_tail=False)
    try:
        out_dir = os.path.join(base, "sink")
        ckpt = os.path.join(base, "ckpt")
        os.makedirs(out_dir)
        schema = spark.read.parquet(os.path.join(src, "chunk_000")).schema

        evidence = {"failed_injected": False, "skipped_batches": [], "written_batches": []}
        armed = {"on": True}

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            final = os.path.join(out_dir, f"batch-{batch_id:05d}")
            if os.path.exists(final):
                # Redelivered batch already published: idempotent skip.
                evidence["skipped_batches"].append(batch_id)
            else:
                tmp = final + ".tmp"
                shutil.rmtree(tmp, ignore_errors=True)
                batch_df.write.mode("overwrite").parquet(tmp)
                os.rename(tmp, final)  # atomic publish on this fs
                evidence["written_batches"].append(batch_id)
            if armed["on"] and batch_id == 2:
                # Injected crash in the worst-case window: the side
                # effect is published, the streaming commit is not.
                armed["on"] = False
                evidence["failed_injected"] = True
                raise RuntimeError("injected sink failure (post-write, pre-commit)")

        def incarnation() -> None:
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .option("latestFirst", "false")
                .parquet(os.path.join(src, "chunk_*"))
            )
            from jsmr_spark.compat import cents

            out = stream.select(
                "event_id",
                "user_id",
                cents(F.col("value")).alias("vc"),
            )
            q = (
                out.writeStream.foreachBatch(sink)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            try:
                q.awaitTermination()
            finally:
                q.stop()

        with _replay_shuffle_clamp(spark, n_rows):
            try:
                incarnation()
                raise AssertionError("injected failure did not surface")
            except Exception as e:  # noqa: BLE001 — the injected failure
                if "injected sink failure" not in str(e):
                    raise
            incarnation()  # restart from the same checkpoint

        final_rows = (
            spark.read.parquet(os.path.join(out_dir, "batch-*"))
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                (F.sum("vc") / 100.0).alias("spend"),
            )
        )
        # Materialize before the temp dir is deleted.
        rows = final_rows.collect()
        df = spark.createDataFrame(rows, "user_id long, n_events long, spend double")
        return df, evidence
    finally:
        shutil.rmtree(base, ignore_errors=True)


def run_cdc_apply_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply: maintain a keyed TABLE (latest value +
    update count per (user_id, event_type)) from a change stream, one
    merge per micro-batch — the foreachBatch + MERGE pattern every
    lakehouse ingest job runs (Delta/Iceberg MERGE INTO keyed on the
    primary key; here the table is versioned parquet with an atomic
    directory swap).

    Per batch: aggregate the incoming changes per key (latest value by
    a total (epoch_us, event_id) order, plus a count), full-outer-merge
    into the current table version (newer ord wins the value; counts
    add), write version N+1, atomically repoint. Ord comparison — not
    arrival order — decides the winner, so the merge is correct even
    if batches arrived out of order.

    Scale shape: the per-batch merge is ONE keyed shuffle of
    (batch-keys + table), and the table stays value-compacted (one row
    per key). At 100 TB the parquet-version table becomes a
    transactional format and the merge becomes its MERGE INTO; the
    query graph is identical. Returns the final table — value-checked
    by the registered key against the batch aggregate over all events."""
    base, src, n_rows = _stage_chunks(spark, sf_dir, n_chunks=6, late_tail=False)
    try:
        tbl_root = os.path.join(base, "table")
        os.makedirs(tbl_root)
        state = {"version": 0}  # version 0 = empty table

        schema = spark.read.parquet(os.path.join(src, "chunk_000")).schema
        ord_col = F.concat(
            F.lpad(F.unix_micros(F.col("ts")).cast("string"), 20, "0"),
            F.lit("#"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        )

        def apply_batch(batch_df: DataFrame, _batch_id: int) -> None:
            from jsmr_spark.compat import cents

            incoming = (
                batch_df.select(
                    "user_id",
                    "event_type",
                    cents(F.col("value")).alias("vc"),
                    ord_col.alias("ord"),
                )
                .groupBy("user_id", "event_type")
                .agg(
                    F.max_by("vc", F.col("ord")).alias("vc"),
                    F.max("ord").alias("ord"),
                    F.count(F.lit(1)).alias("n_updates"),
                )
            )
            if state["version"] > 0:
                cur = spark.read.parquet(
                    os.path.join(tbl_root, f"v{state['version']:04d}")
                )
                i = incoming.alias("i")
                c = cur.alias("c")
                merged = (
                    i.join(
                        c,
                        (F.col("i.user_id") == F.col("c.user_id"))
                        & (F.col("i.event_type") == F.col("c.event_type")),
                        "full_outer",
                    )
                    .select(
                        F.coalesce(F.col("i.user_id"), F.col("c.user_id")).alias("user_id"),
                        F.coalesce(F.col("i.event_type"), F.col("c.event_type")).alias(
                            "event_type"
                        ),
                        # newer ord wins the value — NULL-safe via coalesce
                        # of the comparison chain
                        F.when(
                            F.col("c.ord").isNull() | (F.col("i.ord") > F.col("c.ord")),
                            F.col("i.vc"),
                        )
                        .otherwise(F.col("c.vc"))
                        .alias("vc"),
                        F.greatest(
                            F.coalesce(F.col("i.ord"), F.col("c.ord")),
                            F.coalesce(F.col("c.ord"), F.col("i.ord")),
                        ).alias("ord"),
                        (
                            F.coalesce(F.col("i.n_updates"), F.lit(0))
                            + F.coalesce(F.col("c.n_updates"), F.lit(0))
                        ).alias("n_updates"),
                    )
                )
            else:
                merged = incoming
            nxt = os.path.join(tbl_root, f"v{state['version'] + 1:04d}")
            tmp = nxt + ".tmp"
            merged.write.mode("overwrite").parquet(tmp)
            os.rename(tmp, nxt)  # atomic version publish
            state["version"] += 1

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(os.path.join(src, "chunk_*"))
        )
        with _replay_shuffle_clamp(spark, n_rows):
            q = (
                stream.writeStream.foreachBatch(apply_batch)
                .outputMode("append")
                .option("checkpointLocation", os.path.join(base, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.processAllAvailable()
            q.stop()

        final = spark.read.parquet(
            os.path.join(tbl_root, f"v{state['version']:04d}")
        ).select(
            "user_id",
            "event_type",
            (F.col("vc") / 100.0).alias("last_value"),
            "n_updates",
        )
        rows = final.collect()
        return spark.createDataFrame(
            rows, "user_id long, event_type string, last_value double, n_updates long"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def run_transform_with_state_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running totals on the Spark 4 transformWithState API —
    the successor to applyInPandasWithState (which powers
    stream_stateful_counter): an object-oriented StatefulProcessor with
    named, schema'd state slots managed by the state store. Same
    semantics as the counter (exact-cents totals per user), different —
    newer — engine surface; with a closed input the converged state
    must equal the batch aggregate.

    At scale this API is the basis for arbitrary per-key services
    (timers, TTL state, multiple typed slots per key) with state
    checkpointed exactly-once like any streaming aggregate."""
    try:
        # The transformWithState state-server protocol runs over
        # protobuf; this sandbox has no protobuf wheel (verified: the
        # streaming python runner crashes with ImportError at init).
        import google.protobuf  # noqa: F401
    except ImportError as e:  # pragma: no cover - environment-specific
        raise NotImplementedError(
            "transformWithStateInPandas requires protobuf (the state-"
            "server wire protocol), which is not installed in this "
            "sandbox. applyInPandasWithState — stream_stateful_counter, "
            "value-checked — is the shipped equivalent surface; swap to "
            "this runner on any cluster with protobuf present."
        ) from e

    import pandas as pd

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    from jsmr_spark.compat import cents

    class _TotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n LONG, vc LONG")

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, vc = self._state.get()
            else:
                n, vc = 0, 0
            for pdf in rows:
                n += len(pdf)
                vc += int(pdf["vc"].sum())
            self._state.update((n, vc))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "vc": [vc]}
            )

        def close(self) -> None:
            pass

    base, src, n_rows = _stage_chunks(spark, sf_dir, n_chunks=6, late_tail=False)
    try:
        schema = spark.read.parquet(os.path.join(src, "chunk_000")).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(os.path.join(src, "chunk_*"))
        )
        out = (
            stream.select("user_id", cents(F.col("value")).alias("vc"))
            .groupBy("user_id")
            .transformWithStateInPandas(
                _TotalsProcessor(),
                outputStructType="user_id long, n_events long, vc long",
                outputMode="Update",
                timeMode="None",
            )
        )
        name = f"tws_{uuid.uuid4().hex[:8]}"
        with _replay_shuffle_clamp(spark, n_rows):
            q = (
                out.writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.processAllAvailable()
            q.stop()
        return spark.table(name)
    finally:
        shutil.rmtree(base, ignore_errors=True)


PY_STREAM_TOTAL = 5_000
PY_STREAM_BATCH = 1_000
PY_STREAM_KEYS = 20
PY_STREAM_PARTS = 4


def run_python_stream_source(spark: SparkSession) -> DataFrame:
    """UNBOUNDED ingest through a USER-DEFINED streaming connector
    (Spark 4 Python DataSourceStreamReader) — the answer to "no Kafka
    in this sandbox" that goes beyond swapping a source string: this
    implements the connector side itself. The reader owns real offset
    management (initialOffset / latestOffset advance a counter by
    {PY_STREAM_BATCH} per micro-batch), plans {PY_STREAM_PARTS}
    parallel range partitions per batch, and acknowledges commits —
    the exact surface a Kafka-like system plugs into when no JVM
    connector exists.

    The emitted rows are the deterministic sequence 0..{PY_STREAM_TOTAL}
    so the converged complete-mode aggregate is a pure function of the
    offsets: the registered key value-checks per-key count/sum against
    the oracle's closed form. A skipped batch, re-emitted batch, or
    partition-planning overlap breaks the hash."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class _CounterSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "jsmr_pycounter"

        def schema(self) -> str:
            return "v long"

        def streamReader(self, schema) -> DataSourceStreamReader:
            return _CounterReader()

    class _CounterReader(DataSourceStreamReader):
        def initialOffset(self):
            return {"v": 0}

        def latestOffset(self):
            cur = getattr(self, "_cur", 0)
            self._cur = min(cur + PY_STREAM_BATCH, PY_STREAM_TOTAL)
            return {"v": self._cur}

        def partitions(self, start, end):
            s, e = start["v"], end["v"]
            step = max(1, (e - s) // PY_STREAM_PARTS)
            bounds = list(range(s, e, step)) + [e]
            return [
                InputPartition((a, b)) for a, b in zip(bounds, bounds[1:]) if a < b
            ]

        def read(self, partition):
            s, e = partition.value
            for v in range(s, e):
                yield (v,)

        def commit(self, end) -> None:
            pass

    import time as _time

    spark.dataSource.register(_CounterSource)
    agg = (
        spark.readStream.format("jsmr_pycounter")
        .load()
        .groupBy((F.col("v") % PY_STREAM_KEYS).alias("user_key"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"))
    )
    name = f"pysrc_{uuid.uuid4().hex[:8]}"
    with _replay_shuffle_clamp(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .start()
        )
        try:
            done = None
            deadline = _time.time() + 120
            while _time.time() < deadline:
                # r13: same driver-local recentProgress gate as the
                # rate-source replay — the counter source emits a fixed
                # sequential total, so the confirming Spark query runs
                # only once enough source rows are in.
                ingested = sum(p.numInputRows for p in q.recentProgress)
                if ingested >= PY_STREAM_TOTAL:
                    done = spark.table(name).agg(F.sum("n")).collect()[0][0]
                    if done == PY_STREAM_TOTAL:
                        break
                _time.sleep(0.05)
            else:
                raise TimeoutError(
                    f"python stream source ingested {done} of {PY_STREAM_TOTAL} rows in 120s"
                )
        finally:
            q.stop()
    return spark.table(name)


def run_ewma_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q_ts_ewma: per-user truncated EWMA (alpha=1/2,
    K=20) as a custom stateful operator via applyInPandasWithState.

    State per user is the last K event values in exact integer cents —
    bounded by K, not by history — and every update replays the same
    power-of-two integer algebra as the batch key: num = sum(vc_i <<
    (K-1-lag)), den = 2^K - 2^(K-n), one final float division, the
    identical half-away r4. The staged chunks arrive in global
    (ts, event_id) order and each micro-batch is sorted the same way,
    so the converged stream state MUST equal the batch window's value
    at each user's last event — which is exactly what the oracle pins.

    Emits (user, cumulative n_total, n_win, ewma) in update mode; the
    caller keeps the max-n_total row per user as the converged value.
    """
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    K = 20

    def update_ewma(key, pdfs, state: GroupState):
        (user_id,) = key
        vals, n_total = state.get if state.exists else ([], 0)
        vals = list(vals)
        parts = [pdf for pdf in pdfs]
        pdf = pd.concat(parts).sort_values(["ts", "event_id"])
        n_total += len(pdf)
        # half-away-from-zero, matching compat.cents() and the batch
        # EWMA path (ADVICE r4: pandas .round() is half-to-even, which
        # only agreed because fixture values are exact 2dp — sub-cent
        # inputs would silently diverge stream vs batch).
        v100 = pdf["value"].to_numpy() * 100.0
        vc = (
            (np.floor(np.abs(v100) + 0.5) * np.sign(v100)).astype("int64").tolist()
        )
        vals = (vals + vc)[-K:]
        n = len(vals)
        num = sum(v << (K - n + i) for i, v in enumerate(vals))
        den = (1 << K) - (1 << (K - n))
        x = num / den / 100.0
        ewma = math.floor(abs(x) * 1e4 + 0.5) * (1 if x >= 0 else -1) / 1e4
        state.update((vals, n_total))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_total": [n_total],
                "n_win": [n],
                "ewma": [ewma],
            }
        )

    base, src, n_rows = _stage_chunks(spark, sf_dir, n_chunks=6, late_tail=False)
    try:
        schema = spark.read.parquet(os.path.join(src, "chunk_000")).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "chunk_*"))
        )
        transformed = (
            stream.select("user_id", "ts", "event_id", "value")
            .groupBy("user_id")
            .applyInPandasWithState(
                update_ewma,
                outputStructType="user_id long, n_total long, n_win int, ewma double",
                stateStructType="vals array<long>, n_total long",
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
        name = f"ewma_{uuid.uuid4().hex[:8]}"
        with _replay_shuffle_clamp(spark, n_rows):
            q = (
                transformed.writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.processAllAvailable()
            q.stop()
        return spark.table(name)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def run_window_topk_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q_stream_topk (Flink-style streaming top-N):
    the per-(window, user) aggregate is the streaming-stateful part —
    watermark-gated, append-mode, exact integer cents in state — and
    the top-3 rank runs over the EMITTED (closed) windows, where it is
    a bounded per-window pass. Ranking inside the stream would need
    sorted update-mode emission Structured Streaming doesn't do; the
    aggregate-then-rank split is the production pattern (rank in
    foreachBatch or over the sink table) and keeps rank input at
    users-per-window rows, not the event stream."""
    from jsmr_spark.compat import cents

    base, src, n_rows = _stage_chunks(spark, sf_dir, n_chunks=8, late_tail=False)
    try:
        def transform(stream: DataFrame) -> DataFrame:
            return (
                stream.withWatermark("ts", "10 minutes")
                .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(cents(F.col("value"))).alias("spend_cents"),
                )
                .select(
                    F.col("w.start").alias("window_start"),
                    "user_id",
                    "n",
                    "spend_cents",
                )
            )

        name = f"wintopk_{uuid.uuid4().hex[:8]}"
        emitted = _run_stream(spark, src, transform, name, n_rows)
        rw = Window.partitionBy("window_start").orderBy(
            F.desc("spend_cents"), F.asc("user_id")
        )
        return (
            emitted.withColumn("rnk", F.row_number().over(rw))
            .filter(F.col("rnk") <= 3)
            .select(
                "window_start",
                "rnk",
                "user_id",
                "n",
                (F.col("spend_cents") / 100.0).alias("spend"),
            )
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _stream_stream_join(spark: SparkSession, sf_dir: str, how: str, select_cols):
    """Shared construction for the two-stream interval join replays:
    stage chunks, build the view and click file streams with 10-minute
    watermarks, join on user_id with the click-within-5-minutes bound
    (`how` = "inner" | "left_outer"), sink to memory, return the table.
    One function so the predicate, watermark delay, and staging can
    never diverge between the hash-checked inner twin and the
    null-semantics outer twin."""
    base, src, n_rows = _stage_chunks(spark, sf_dir, n_chunks=6, late_tail=False)
    try:
        schema = spark.read.parquet(os.path.join(src, "chunk_000")).schema

        def source() -> DataFrame:
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .option("latestFirst", "false")
                .parquet(os.path.join(src, "chunk_*"))
            )

        v = (
            source()
            .filter(F.col("event_type") == "view")
            .select(
                F.col("event_id").alias("view_id"),
                "user_id",
                F.col("ts").alias("v_ts"),
            )
            .withWatermark("v_ts", "10 minutes")
        )
        k = (
            source()
            .filter(F.col("event_type") == "click")
            .select(
                F.col("event_id").alias("click_id"),
                F.col("user_id").alias("k_user"),
                F.col("ts").alias("k_ts"),
            )
            .withWatermark("k_ts", "10 minutes")
        )
        joined = v.join(
            k,
            (F.col("user_id") == F.col("k_user"))
            & (F.col("k_ts") > F.col("v_ts"))
            & (F.col("k_ts") <= F.col("v_ts") + F.expr("INTERVAL 5 MINUTES")),
            how,
        ).select(*select_cols)
        name = f"ssjoin_{how}_{uuid.uuid4().hex[:8]}"
        with _replay_shuffle_clamp(spark, n_rows):
            q = (
                joined.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.processAllAvailable()
            q.stop()
        return spark.table(name)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def run_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE stream-stream interval join: views and clicks arrive as two
    independent watermarked streams (same staged chunks, two file
    sources), joined on user_id with the click-within-5-minutes time
    bound — the flagship Structured Streaming surface where BOTH sides
    are stateful: each side buffers rows in the state store until the
    other side's matches arrive, and the watermark + time-range
    condition lets the engine evict state older than v_ts + 5min.

    For an INNER join, emission is match-driven, not watermark-gated
    (watermarks only bound state cleanup), so a CLOSED input emits
    every pair exactly once and the result is fully hash-checkable
    against the batch oracle — stronger than the append-mode windowed
    aggregates, whose tail windows stay open at shutdown."""
    return _stream_stream_join(
        spark,
        sf_dir,
        "inner",
        [
            "view_id",
            "click_id",
            "user_id",
            (F.unix_micros(F.col("k_ts")) - F.unix_micros(F.col("v_ts"))).alias(
                "gap_us"
            ),
        ],
    )


def run_stream_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream join — the subtle half of the
    two-stream surface: matches emit as they pair (like the inner
    join), but a view with NO click can only emit its null-extended
    row once the watermark proves no future click can still arrive
    inside its 5-minute bound. State eviction and null emission are
    both watermark-driven, so the tail of the input stays buffered at
    shutdown — which is why this key is rows-only (the null boundary
    is watermark-timing-dependent) while its inner twin hash-matches.
    The replay test pins the decidable parts: matched pairs equal the
    batch inner join exactly, every null-extended view is a true batch
    anti-join member, and nulls cover the anti-join set up to the
    final-watermark tail."""
    return _stream_stream_join(
        spark, sf_dir, "left_outer", ["view_id", "user_id", "v_ts", "click_id"]
    )
