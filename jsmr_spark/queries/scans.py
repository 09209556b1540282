"""Scans / sources / sinks (SURVEY.md §2.B).

Reference parity: JsMr's input scan + chunk split (SURVEY.md §2.A
A1-A2) become parquet scans with Spark-managed input splits; the
output writer (A7) becomes df.write.

Scale notes: q_scan_project exists to pin the pushdown contract — the
physical plan must show ReadSchema with only the projected columns and
PushedFilters for the predicate (asserted in tests/test_plans.py).
That property is what makes a 100 TB scan read only the bytes it needs.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jsmr_spark.queries.common import t
from jsmr_spark.registry import query


@query(
    "q_scan_project",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE l_quantity > 45
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + predicate that must reach the parquet reader
    (column pruning + filter pushdown)."""
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


@query("q_scan_count", "SELECT count(*) AS n_rows FROM lineitem")
def q_scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table count — answered from parquet row-group metadata,
    no data pages read."""
    return t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))


@query(
    "q_scan_events_ts",
    """
    SELECT event_id, ts, user_id, event_type
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-16'
    """,
)
def q_scan_events_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events scan exercising the ns->us normalization (io.load_table)
    plus a timestamp-range predicate on the normalized column."""
    return (
        t(spark, sf_dir, "events")
        .filter(
            (F.col("ts") >= F.lit("2024-01-15").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-16").cast("timestamp"))
        )
        .select("event_id", "ts", "user_id", "event_type")
    )


@query(
    "q_source_json",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INT) % 10 = 3
    """,
)
def q_source_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured source: extract from the JSON-in-string props
    column, typed and untyped, and filter on the parsed value."""
    k = F.get_json_object(F.col("props"), "$.k")
    return (
        t(spark, sf_dir, "events")
        .select(
            "event_id",
            k.alias("k_str"),
            k.cast("int").alias("k_int"),
        )
        .filter(F.col("k_int") % 10 == 3)
    )


def _sink_roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    """Write a derived result with df.write.<fmt>, re-read it, and report
    written/re-read row counts (side-effect op => rows-only check)."""
    # uuid-suffixed dir: concurrent sessions (driver run + bench) must
    # never race on one path. Both counts materialize before cleanup.
    out_dir = os.path.join(
        tempfile.gettempdir(), f"jsmr_sink_{fmt}_{uuid.uuid4().hex[:8]}"
    )
    try:
        src = (
            t(spark, sf_dir, "orders")
            .groupBy("o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        n_written = src.count()
        writer = src.write.mode("overwrite")
        if fmt == "parquet":
            writer.parquet(out_dir)
            back = spark.read.parquet(out_dir)
        elif fmt == "orc":
            writer.orc(out_dir)
            back = spark.read.orc(out_dir)
        elif fmt == "json":
            writer.json(out_dir)
            back = spark.read.json(out_dir)
        else:
            writer.option("header", "true").csv(out_dir)
            back = spark.read.option("header", "true").csv(out_dir)
        n_back = back.count()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return spark.createDataFrame(
        [(fmt, n_written, n_back, n_written == n_back)],
        "format string, n_written long, n_reread long, roundtrip_ok boolean",
    )


@query("sink_parquet", None)  # side-effect sink => rows-only by design
def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet sink round-trip (JsMr output writer, SURVEY.md §2.A A7)."""
    return _sink_roundtrip(spark, sf_dir, "parquet")


@query("sink_csv", None)  # side-effect sink => rows-only by design
def sink_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink round-trip with header schema recovery."""
    return _sink_roundtrip(spark, sf_dir, "csv")


@query("sink_json", None)  # side-effect sink => rows-only by design
def sink_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink round-trip (one object per line — the interchange
    format every downstream tokenizer/annotation tool reads). Schema is
    re-inferred on read-back, so the count check also exercises JSON
    schema inference."""
    return _sink_roundtrip(spark, sf_dir, "json")


@query("sink_orc", None)  # side-effect sink => rows-only by design
def sink_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink round-trip — the second columnar container Spark ships
    natively (predicate pushdown + column pruning work identically to
    parquet through the same DataSource V2 scan)."""
    return _sink_roundtrip(spark, sf_dir, "orc")


@query("source_text", None)  # file round-trip => rows-only by design
def source_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain-text LINE source (spark.read.text): one row per line, the
    rawest scraped-corpus ingest. Round-trips document text through
    .txt part files and re-derives corpus token statistics; emits
    written/re-read line counts so the round trip is self-checking."""
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"jsmr_source_text_{spark.sparkContext.applicationId}",
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    src = t(spark, sf_dir, "documents").select("text")
    n_written = src.count()
    src.write.mode("overwrite").text(out_dir)
    back = spark.read.text(out_dir)
    return back.select(
        F.size(F.split(F.col("value"), " ")).cast("long").alias("n_tokens")
    ).agg(
        F.lit(n_written).alias("n_lines_written"),
        F.count(F.lit(1)).alias("n_lines_reread"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.count(F.lit(1)) == n_written).alias("roundtrip_ok"),
    )


@query("source_jsonl", None)  # file round-trip => rows-only by design
def source_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL FILE source (spark.read.json with an explicit schema — the
    line-delimited ingest format of every scraped-text pipeline; the
    JSON-in-a-column flavor is q_source_json). Explicit schema matters
    at scale: schema inference reads the data twice. Round-trips events
    through .json files and aggregates per event_type."""
    # Session-scoped dir (returned DataFrame reads it lazily, so it
    # cannot be deleted here); the applicationId suffix keeps concurrent
    # sessions from racing on one path.
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"jsmr_source_jsonl_{spark.sparkContext.applicationId}",
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    src = t(spark, sf_dir, "events").select("event_id", "event_type", "user_id")
    src.write.mode("overwrite").json(out_dir)
    back = spark.read.schema("event_id bigint, event_type string, user_id bigint").json(
        out_dir
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("event_id").alias("min_event"),
            F.max("event_id").alias("max_event"),
        )
    )
