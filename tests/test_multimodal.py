"""Binary-column plumbing: Arrow batches, schema, determinism
(jsmr_spark/multimodal.py)."""

import pytest

from jsmr_spark.io import load_table
from jsmr_spark.multimodal import decode_image, decode_pipeline, synthesize_blob_col
from tests.conftest import SF_DIR


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00" * 64)


def test_decode_pipeline_schema_and_determinism(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = decode_pipeline(docs)
    assert out.columns == ["doc_id", "n_bytes", "width", "height", "n_channels", "mean_byte", "thumb"]
    rows1 = {r.doc_id: (r.n_bytes, r.width, r.height, r.n_channels, r.mean_byte) for r in out.collect()}
    rows2 = {r.doc_id: (r.n_bytes, r.width, r.height, r.n_channels, r.mean_byte) for r in decode_pipeline(docs).collect()}
    assert rows1 == rows2
    assert len(rows1) == docs.count()
    assert all(v[0] == 64 for v in rows1.values())
    assert all(16 <= v[1] <= 127 and 16 <= v[2] <= 127 and 1 <= v[3] <= 4 for v in rows1.values())


def test_blob_column_is_binary(spark):
    docs = load_table(spark, SF_DIR, "documents")
    df = synthesize_blob_col(docs.select("doc_id", "text"))
    assert dict(df.dtypes)["blob"] == "binary"
    blob = df.limit(1).collect()[0].blob
    assert isinstance(blob, (bytes, bytearray)) and len(blob) == 64
