"""Multimodal (binary) column processing for training-data pipelines
(driver mandate).

Images/audio/video are opaque `binary` columns with typed metadata,
processed by Arrow-batched functions over mapInPandas. The container
ships no image/audio libraries, so the DECODE step is stubbed exactly
as mandated: `decode_image()` raises NotImplementedError, and the
pipelines run on `fake_decode()` — a deterministic header parse of the
synthetic bytes — while all the Spark-side plumbing (binary schema,
Arrow batch iteration, per-batch vectorization, partition safety) is
real and tested (tests/test_multimodal.py).

At scale this is the canonical shape: bytes stay in executor-side
Arrow buffers (never the driver), decode parallelism = partition
count, and feature extraction emits narrow typed columns so downstream
queries never reread the blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Schema of the decoded metadata/features emitted per blob.
DECODED_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, n_channels int, "
    "mean_byte double, thumb binary"
)


def synthesize_blob_col(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a deterministic fake 'image' binary column derived from the
    text (md5 chain -> 64 bytes). Stands in for real stored media bytes;
    the plumbing downstream does not care that it is synthetic."""
    chain = F.concat(
        *[F.unhex(F.md5(F.concat(F.col(text_col), F.lit(str(i))))) for i in range(4)]
    )
    return df.withColumn("blob", chain)


def decode_image(blob: bytes) -> tuple[int, int, int]:
    """Real image decode — requires an imaging library not present in
    this container. Kept as the documented integration point."""
    raise NotImplementedError(
        "no imaging library in this environment; use fake_decode() — "
        "swap in PIL/libvips here when available"
    )


def fake_decode(blob: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in decode: derive (width, height, channels)
    from the first header bytes, as a real decoder would."""
    return 16 + blob[0] % 112, 16 + blob[1] % 112, 1 + blob[2] % 4


def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: decode + feature-extract + thumbnail-stub for
    each Arrow batch. Vectorized per batch; one output row per blob."""
    for pdf in batches:
        blobs = pdf["blob"]
        meta = [fake_decode(b) for b in blobs]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(b) for b in blobs],
                "width": [m[0] for m in meta],
                "height": [m[1] for m in meta],
                "n_channels": [m[2] for m in meta],
                # feature extraction: mean byte value (exact int sum / n)
                "mean_byte": [float(sum(b)) / len(b) for b in blobs],
                # resize/frame-sample stub: first 16 bytes as a "4x4 thumbnail"
                "thumb": [bytes(b[:16]) for b in blobs],
            }
        )


def decode_pipeline(docs: DataFrame) -> DataFrame:
    """documents -> synth blob -> Arrow-batched decode/feature table."""
    with_blob = synthesize_blob_col(docs.select("doc_id", "text"))
    return with_blob.select("doc_id", "blob").mapInPandas(decode_batches, DECODED_SCHEMA)
