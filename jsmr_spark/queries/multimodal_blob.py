"""Binary-column (multimodal) pipeline key — see jsmr_spark/multimodal.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jsmr_spark.compat import r4
from jsmr_spark.queries.common import t
from jsmr_spark.registry import query


@query("q_multimodal_decode", None)  # binary blobs + stubbed decode => rows-only
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode/feature-extraction over a binary column via
    mapInPandas (decode stubbed deterministically — no imaging libs in
    this container; plumbing is real). Aggregates the extracted
    features per language."""
    from jsmr_spark.multimodal import decode_pipeline

    docs = t(spark, sf_dir, "documents")
    decoded = decode_pipeline(docs)
    return (
        decoded.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_blobs"),
            F.sum("n_bytes").alias("total_bytes"),
            r4(F.avg("mean_byte")).alias("avg_mean_byte"),
            F.min("width").alias("min_width"),
            F.max("height").alias("max_height"),
        )
    )


@query("q_multimodal_resize", None)  # binary blobs + mapInPandas => rows-only
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real resize path over the binary column: decode PPM -> numpy
    nearest-neighbor thumbnail (jsmr_spark/multimodal.py:resize_image)
    inside Arrow batches; aggregates resized stats per language. The
    decode+resize is genuine pixel math, not a stub — only exotic
    containers fall back."""
    from jsmr_spark.multimodal import resize_pipeline

    docs = t(spark, sf_dir, "documents")
    resized = resize_pipeline(docs)
    return (
        resized.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.any_value("out_w").alias("out_w"),
            F.any_value("out_h").alias("out_h"),
            r4(F.avg("resized_mean")).alias("avg_resized_mean"),
            F.sum(F.length("resized")).alias("total_resized_bytes"),
        )
    )


@query("q_multimodal_framesample", None)  # binary videos + mapInPandas => rows-only
def q_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: multi-frame P6 'videos' split by
    parsing the repeated headers executor-side, every 2nd frame kept
    and decoded (jsmr_spark/multimodal.py:framesample_batches);
    aggregates frame counts per source. Bytes stay in Arrow buffers;
    sampling parallelism = partition count."""
    from jsmr_spark.multimodal import framesample_pipeline

    docs = t(spark, sf_dir, "documents")
    sampled = framesample_pipeline(docs)
    return (
        sampled.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_videos"),
            F.sum("n_frames").cast("long").alias("total_frames"),
            F.sum("n_sampled").cast("long").alias("total_sampled"),
            r4(F.avg("sampled_mean")).alias("avg_sampled_mean"),
        )
    )
