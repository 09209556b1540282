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
