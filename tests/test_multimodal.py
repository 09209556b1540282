"""Binary-column plumbing: real PPM/BMP decode, Arrow batches, schema,
determinism (jsmr_spark/multimodal.py)."""

import struct

import pytest

from jsmr_spark.io import load_table
from jsmr_spark.multimodal import (
    PPM_H,
    PPM_W,
    decode_image,
    decode_pipeline,
    fake_decode,
    synthesize_blob_col,
)
from tests.conftest import SF_DIR

_BLOB_LEN = len(f"P6\n{PPM_W} {PPM_H}\n255\n") + PPM_W * PPM_H * 3


def _bmp(width, height, bpp, pixels):
    """Minimal uncompressed BMP (BITMAPINFOHEADER) encoder."""
    row = (width * (bpp // 8) + 3) // 4 * 4
    padded = b"".join(
        pixels[y * width * (bpp // 8) : (y + 1) * width * (bpp // 8)].ljust(row, b"\x00")
        for y in range(abs(height))
    )
    header = struct.pack("<2sIHHI", b"BM", 54 + len(padded), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, bpp, 0, len(padded), 0, 0, 0, 0)
    return header + info + padded


def test_decode_ppm_roundtrip():
    pixels = bytes(range(2 * 2 * 3))
    blob = b"P6\n# a comment\n2 2\n255\n" + pixels
    assert decode_image(blob) == (2, 2, 3, pixels)


def test_decode_ppm_truncated_raises():
    with pytest.raises(ValueError):
        decode_image(b"P6\n4 4\n255\n" + b"\x00" * 10)


def test_decode_bmp_roundtrip():
    pixels = bytes(range(3 * 2 * 3))  # 3x2 RGB, rows pad 9 -> 12
    blob = _bmp(3, 2, 24, pixels)
    w, h, c, px = decode_image(blob)
    assert (w, h, c) == (3, 2, 3)
    assert px[0:9] == pixels[0:9] and px[12:21] == pixels[9:18]
    # top-down (negative height) parses to the same magnitude
    assert decode_image(_bmp(3, -2, 24, pixels))[:3] == (3, 2, 3)


def test_decode_bmp_compressed_rejected():
    blob = bytearray(_bmp(2, 2, 24, bytes(16)))
    struct.pack_into("<I", blob, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError):
        decode_image(bytes(blob))


def test_decode_unknown_format_raises_and_fake_fallback():
    with pytest.raises(ValueError):
        decode_image(b"\x01\x02\x03" + b"\x00" * 61)
    w, h, c = fake_decode(b"\x01\x02\x03" + b"\x00" * 61)
    assert 16 <= w <= 127 and 16 <= h <= 127 and 1 <= c <= 4


def test_decode_pipeline_schema_and_determinism(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = decode_pipeline(docs)
    assert out.columns == [
        "doc_id", "n_bytes", "width", "height", "n_channels",
        "n_pixel_bytes", "byte_sum", "mean_byte", "thumb",
    ]
    rows1 = {r.doc_id: (r.n_bytes, r.width, r.height, r.n_channels, r.mean_byte) for r in out.collect()}
    rows2 = {r.doc_id: (r.n_bytes, r.width, r.height, r.n_channels, r.mean_byte) for r in decode_pipeline(docs).collect()}
    assert rows1 == rows2
    assert len(rows1) == docs.count()
    # every synthesized blob is a real 4x4 RGB PPM decoded by the real parser
    assert all(v[0] == _BLOB_LEN for v in rows1.values())
    assert all((v[1], v[2], v[3]) == (PPM_W, PPM_H, 3) for v in rows1.values())
    assert all(0.0 <= v[4] <= 255.0 for v in rows1.values())


def test_pipeline_mean_is_pixel_mean(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(1)
    blob = synthesize_blob_col(docs.select("doc_id", "text")).collect()[0].blob
    w, h, c, px = decode_image(bytes(blob))
    expected = float(sum(px)) / len(px)
    got = decode_pipeline(docs).collect()[0]
    assert got.mean_byte == pytest.approx(expected)
    assert bytes(got.thumb) == px[:16]


def test_blob_column_is_binary(spark):
    docs = load_table(spark, SF_DIR, "documents")
    df = synthesize_blob_col(docs.select("doc_id", "text"))
    assert dict(df.dtypes)["blob"] == "binary"
    blob = df.limit(1).collect()[0].blob
    assert isinstance(blob, (bytes, bytearray)) and len(blob) == _BLOB_LEN


def test_resize_image_nearest_neighbor():
    from jsmr_spark.multimodal import OUT_H, OUT_W, resize_image

    # 4x4 single-channel ramp: nearest-neighbor to 2x2 picks rows/cols
    # round(linspace(0,3,2)) = (0, 3) -> corner pixels.
    pixels = bytes(range(16))
    out = resize_image(4, 4, 1, pixels)
    assert len(out) == OUT_W * OUT_H
    assert out == bytes([0, 3, 12, 15])


def test_resize_pipeline_schema_and_rows(spark):
    from jsmr_spark.multimodal import OUT_H, OUT_W, resize_pipeline

    docs = load_table(spark, SF_DIR, "documents").limit(20)
    out = resize_pipeline(docs)
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert (r.out_w, r.out_h) == (OUT_W, OUT_H)
        assert len(r.resized) == OUT_W * OUT_H * 3  # RGB thumbs
        assert 0.0 <= r.resized_mean <= 255.0


def test_ppm_frame_len_matches_synth_layout():
    from jsmr_spark.multimodal import _FRAME_BYTES, ppm_frame_len

    blob = f"P6\n{PPM_W} {PPM_H}\n255\n".encode() + bytes(48)
    assert ppm_frame_len(blob) == _FRAME_BYTES == len(blob)


def test_framesample_counts(spark):
    from jsmr_spark.multimodal import FRAME_STRIDE, framesample_pipeline

    docs = load_table(spark, SF_DIR, "documents").limit(30)
    out = framesample_pipeline(docs).collect()
    assert len(out) == 30
    for r in out:
        # synthesizer emits 2..4 frames keyed on doc_id
        assert r.n_frames == r.doc_id % 3 + 2
        expect_kept = (r.n_frames + FRAME_STRIDE - 1) // FRAME_STRIDE
        assert r.n_sampled == expect_kept
        assert 0.0 <= r.sampled_mean <= 255.0


def test_scenecut_matches_python_model(spark):
    """Per-video cut counts and max jumps from the Spark pipeline equal
    a pure-Python replay of the synthesis chain (md5 frame energies ->
    adjacent deltas -> threshold), for every video at this SF."""
    import hashlib

    from jsmr_spark.multimodal import SCENE_CUT_THRESHOLD, scenecut_pipeline

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    got = {
        r.doc_id: (r.n_frames, r.n_cuts, r.max_jump)
        for r in scenecut_pipeline(docs).collect()
    }
    for d in docs.collect():
        n = d.doc_id % 3 + 2
        energies = [
            sum(
                b
                for i in range(3)
                for b in hashlib.md5(f"{d.text}{f}:{i}".encode()).digest()
            )
            for f in range(n)
        ]
        jumps = [abs(a - b) for a, b in zip(energies, energies[1:])]
        expect = (
            n,
            sum(1 for j in jumps if j > SCENE_CUT_THRESHOLD),
            max(jumps),
        )
        assert got[d.doc_id] == expect, d.doc_id
