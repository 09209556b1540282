"""Multimodal (binary) column processing for training-data pipelines
(driver mandate).

Images/audio/video are opaque `binary` columns with typed metadata,
processed by Arrow-batched functions over mapInPandas. The container
ships no image/audio libraries, so `decode_image()` is a pure-Python
decoder for the two formats that need none (binary PPM `P6` and
uncompressed BITMAPINFOHEADER BMP) — the decode path runs for real end
to end; anything else falls back to `fake_decode()`, a deterministic
header parse, so the pipeline never dies on an exotic container. Swap
`decode_image` for PIL/libvips to widen format support; the Spark-side
plumbing (binary schema, Arrow batch iteration, per-batch
vectorization, partition safety) is identical either way and tested in
tests/test_multimodal.py.

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

# Schema of the decoded metadata/features emitted per blob. byte_sum is
# the EXACT integer sum of pixel-byte values — downstream cross-row
# averages aggregate it (order-independent, oracle-reproducible) instead
# of averaging the per-blob double mean.
DECODED_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, n_channels int, "
    "n_pixel_bytes int, byte_sum long, mean_byte double, thumb binary"
)


PPM_W = PPM_H = 4  # synthesized thumbnails are 4x4 RGB


def synthesize_blob_col(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a deterministic 'image' binary column derived from the
    text: a VALID binary-PPM (P6) 4x4 RGB image whose 48 pixel bytes
    come from an md5 chain. Stands in for real stored media bytes and
    exercises the real `decode_image` parse end to end."""
    header = F.lit(f"P6\n{PPM_W} {PPM_H}\n255\n".encode())
    pixels = [F.unhex(F.md5(F.concat(F.col(text_col), F.lit(str(i))))) for i in range(3)]
    return df.withColumn("blob", F.concat(header, *pixels))


def decode_image(blob: bytes) -> tuple[int, int, int, bytes]:
    """Pure-Python image decode -> (width, height, channels, pixels).

    Supports the two dependency-free formats:
      * binary PPM (``P6``): ASCII header (width, height, maxval;
        ``#`` comments allowed), raw RGB bytes after the single
        whitespace following maxval;
      * uncompressed BMP (``BM``, BITMAPINFOHEADER): little-endian
        width/height/bpp, pixel array at the offset in the file header
        (returned raw, including row padding; height may be negative
        for top-down rows).

    Raises ValueError on anything else — callers fall back to
    :func:`fake_decode`. Swap in PIL/libvips here to widen support."""
    if blob[:2] == b"P6":
        vals: list[int] = []
        i = 2
        while len(vals) < 3:
            while i < len(blob) and blob[i : i + 1].isspace():
                i += 1
            if blob[i : i + 1] == b"#":
                while i < len(blob) and blob[i] != 0x0A:
                    i += 1
                continue
            j = i
            while j < len(blob) and not blob[j : j + 1].isspace():
                j += 1
            if i == j:
                raise ValueError("truncated PPM header")
            vals.append(int(blob[i:j]))
            i = j
        w, h, maxval = vals
        if maxval > 255:
            raise ValueError("16-bit PPM not supported")
        start = i + 1  # single whitespace after maxval, then pixels
        n = w * h * 3
        if len(blob) < start + n:
            raise ValueError("truncated PPM pixel data")
        return w, h, 3, bytes(blob[start : start + n])
    if blob[:2] == b"BM" and len(blob) >= 54:
        import struct

        pix_off = struct.unpack_from("<I", blob, 10)[0]
        w, h = struct.unpack_from("<ii", blob, 18)
        planes, bpp = struct.unpack_from("<HH", blob, 26)
        compression = struct.unpack_from("<I", blob, 30)[0]
        if compression != 0 or bpp not in (8, 24, 32):
            raise ValueError(f"unsupported BMP (compression={compression}, bpp={bpp})")
        c = bpp // 8
        row = (w * c + 3) // 4 * 4  # rows pad to 4 bytes
        n = row * abs(h)
        if len(blob) < pix_off + n:
            raise ValueError("truncated BMP pixel data")
        return w, abs(h), c, bytes(blob[pix_off : pix_off + n])
    raise ValueError("unknown image format (PPM/BMP supported)")


def fake_decode(blob: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in decode: derive (width, height, channels)
    from the first header bytes, as a real decoder would."""
    return 16 + blob[0] % 112, 16 + blob[1] % 112, 1 + blob[2] % 4


def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: decode + feature-extract + thumbnail for each
    Arrow batch. Real parse (PPM/BMP) when the format allows, fake
    header decode otherwise; one output row per blob either way."""
    for pdf in batches:
        blobs = pdf["blob"]
        meta = []
        for b in blobs:
            try:
                meta.append(decode_image(bytes(b)))
            except ValueError:
                w, h, c = fake_decode(b)
                meta.append((w, h, c, bytes(b)))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(b) for b in blobs],
                "width": [m[0] for m in meta],
                "height": [m[1] for m in meta],
                "n_channels": [m[2] for m in meta],
                "n_pixel_bytes": [len(m[3]) for m in meta],
                "byte_sum": [sum(m[3]) for m in meta],
                # feature extraction: mean PIXEL value (exact int sum / n)
                "mean_byte": [float(sum(m[3])) / len(m[3]) for m in meta],
                # resize stub: first 16 pixel bytes as the thumbnail
                "thumb": [m[3][:16] for m in meta],
            }
        )


def decode_pipeline(docs: DataFrame) -> DataFrame:
    """documents -> synth blob -> Arrow-batched decode/feature table."""
    with_blob = synthesize_blob_col(docs.select("doc_id", "text"))
    return with_blob.select("doc_id", "blob").mapInPandas(decode_batches, DECODED_SCHEMA)


# ---------------------------------------------------------------------------
# Resize + video frame-sampling (training-data mandate: decode /
# feature-extract / resize / frame-sample as Arrow-batched UDFs).

OUT_W = OUT_H = 2  # resize target (nearest-neighbor)

RESIZED_SCHEMA = (
    "doc_id long, width int, height int, out_w int, out_h int, "
    "resized binary, resized_byte_sum long, resized_mean double"
)


def resize_image(w: int, h: int, c: int, pixels: bytes) -> bytes:
    """Nearest-neighbor resample to OUT_W x OUT_H — pure numpy (no
    imaging libs), the real algorithm a thumbnail pass runs, not a
    stub. Index grids are computed once per image and applied as one
    fancy-index gather."""
    import numpy as np

    arr = np.frombuffer(pixels, dtype=np.uint8)[: w * h * c].reshape(h, w, c)
    ys = np.linspace(0, h - 1, OUT_H).round().astype(int)
    xs = np.linspace(0, w - 1, OUT_W).round().astype(int)
    return arr[np.ix_(ys, xs)].tobytes()


def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: real decode (PPM/BMP) -> nearest-neighbor
    resize -> thumbnail bytes + mean. Bytes never leave the executor's
    Arrow buffers; one output row per blob."""
    for pdf in batches:
        rows = {
            k: []
            for k in (
                "doc_id", "width", "height", "out_w", "out_h",
                "resized", "resized_byte_sum", "resized_mean",
            )
        }
        for doc_id, b in zip(pdf["doc_id"], pdf["blob"]):
            w, h, c, pix = decode_image(bytes(b))
            small = resize_image(w, h, c, pix)
            rows["doc_id"].append(doc_id)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["out_w"].append(OUT_W)
            rows["out_h"].append(OUT_H)
            rows["resized"].append(small)
            rows["resized_byte_sum"].append(sum(small))
            rows["resized_mean"].append(float(sum(small)) / len(small))
        yield pd.DataFrame(rows)


def resize_pipeline(docs: DataFrame) -> DataFrame:
    """documents -> synth blob -> Arrow-batched decode+resize table."""
    with_blob = synthesize_blob_col(docs.select("doc_id", "text"))
    return with_blob.select("doc_id", "blob").mapInPandas(resize_batches, RESIZED_SCHEMA)


# A synthesized "video" is N concatenated 4x4 binary-PPM frames; the
# layout constant below is the synthesizer's own (header 11 bytes +
# 48 pixel bytes), used only to trim the fixed 4-frame build to the
# per-doc frame count. The CONSUMER never uses it — frame boundaries
# are re-derived by parsing each P6 header (`ppm_frame_len`).
MAX_FRAMES = 4
_FRAME_BYTES = len(f"P6\n{PPM_W} {PPM_H}\n255\n".encode()) + PPM_W * PPM_H * 3

SAMPLED_SCHEMA = (
    "doc_id long, n_frames int, n_sampled int, "
    "sampled_pixel_bytes int, sampled_byte_sum long, sampled_mean double"
)

FRAME_STRIDE = 2  # keep every 2nd frame (0, 2, ...)


def synthesize_video_col(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a deterministic multi-frame 'video' binary: 2..4 valid P6
    frames (count keyed on doc_id), each frame's pixels an md5 chain
    over (text, frame, block). Executor-side column expressions — no
    Python in the build."""
    header = F.lit(f"P6\n{PPM_W} {PPM_H}\n255\n".encode())
    frames = [
        F.concat(
            header,
            *[F.unhex(F.md5(F.concat(F.col(text_col), F.lit(f"{f}:{i}")))) for i in range(3)],
        )
        for f in range(MAX_FRAMES)
    ]
    n = (F.col("doc_id") % (MAX_FRAMES - 1) + 2).cast("int")
    return (
        df.withColumn("_all_frames", F.concat(*frames))
        .withColumn("n_frames_true", n)
        .withColumn(
            "video",
            F.expr(f"substring(_all_frames, 1, {_FRAME_BYTES} * n_frames_true)"),
        )
        .drop("_all_frames")
    )


def ppm_frame_len(blob: bytes) -> int:
    """Byte length of the leading P6 frame (header + pixel payload),
    parsed from the header itself — the consumer-side boundary scan."""
    vals: list[int] = []
    i = 2
    while len(vals) < 3:
        while i < len(blob) and blob[i : i + 1].isspace():
            i += 1
        if blob[i : i + 1] == b"#":
            while i < len(blob) and blob[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(blob) and not blob[j : j + 1].isspace():
            j += 1
        if i == j:
            raise ValueError("truncated PPM header")
        vals.append(int(blob[i:j]))
        i = j
    w, h, _ = vals
    return i + 1 + w * h * 3




def split_p6_frames(b: bytes) -> list[bytes]:
    """Split a concatenated-P6 'video' blob at its repeated headers —
    the one boundary scan both the frame sampler and the scene-cut
    detector must agree on (extracted so a parser fix can never apply
    to one worker and not the other)."""
    frames: list[bytes] = []
    i = 0
    while i < len(b) and b[i : i + 2] == b"P6":
        n = ppm_frame_len(b[i:])
        frames.append(b[i : i + n])
        i += n
    return frames


def framesample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: split each video into frames by parsing the
    repeated P6 headers, keep every FRAME_STRIDE-th frame, decode the
    kept frames and emit counts + mean pixel value of the sample."""
    for pdf in batches:
        out = {
            k: []
            for k in (
                "doc_id",
                "n_frames",
                "n_sampled",
                "sampled_pixel_bytes",
                "sampled_byte_sum",
                "sampled_mean",
            )
        }
        for doc_id, b in zip(pdf["doc_id"], pdf["video"]):
            frames = split_p6_frames(bytes(b))
            kept = frames[::FRAME_STRIDE]
            pix = b"".join(decode_image(f)[3] for f in kept)
            out["doc_id"].append(doc_id)
            out["n_frames"].append(len(frames))
            out["n_sampled"].append(len(kept))
            out["sampled_pixel_bytes"].append(len(pix))
            out["sampled_byte_sum"].append(sum(pix))
            out["sampled_mean"].append(float(sum(pix)) / len(pix))
        yield pd.DataFrame(out)


def framesample_pipeline(docs: DataFrame) -> DataFrame:
    """documents -> synth video -> Arrow-batched frame-sample table."""
    with_video = synthesize_video_col(docs.select("doc_id", "text"))
    return with_video.select("doc_id", "video").mapInPandas(
        framesample_batches, SAMPLED_SCHEMA
    )


# --- perceptual (average) hash ---------------------------------------


def phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched average-hash: decode each blob, collapse RGB to
    per-pixel integer gray sums, and set bit i iff pixel i is brighter
    than the image mean (compared as n*gray > total — exact integers,
    no float mean). 16 pixels -> a 16-bit perceptual hash."""
    for pdf in batches:
        out_doc, out_hash = [], []
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            w, h, _c, px = decode_image(bytes(blob))
            n = w * h
            gray = [px[3 * i] + px[3 * i + 1] + px[3 * i + 2] for i in range(n)]
            total = sum(gray)
            ph = 0
            for i, gv in enumerate(gray):
                if n * gv > total:
                    ph |= 1 << i
            out_doc.append(doc_id)
            out_hash.append(ph)
        yield pd.DataFrame({"doc_id": out_doc, "phash": out_hash})


def phash_pipeline(docs: DataFrame) -> DataFrame:
    """doc_id/text -> (doc_id, phash) via synthesized blobs + the real
    decode path (the hash sees actual parsed pixel bytes, not text)."""
    blobs = synthesize_blob_col(docs).select("doc_id", "blob")
    return blobs.mapInPandas(phash_batches, "doc_id long, phash long")


# --- audio: WAV container parse + frame-energy features --------------

AUDIO_SR = 8_000       # synthesized clips: 8 kHz mono 8-bit PCM
AUDIO_SAMPLES = 48     # 3 md5 digests x 16 bytes
AUDIO_FRAME = 16       # samples per analysis frame (= 3 frames/clip)

_WAV_HEADER = (
    b"RIFF"
    + (36 + AUDIO_SAMPLES).to_bytes(4, "little")
    + b"WAVE"
    + b"fmt "
    + (16).to_bytes(4, "little")
    + (1).to_bytes(2, "little")          # PCM
    + (1).to_bytes(2, "little")          # mono
    + AUDIO_SR.to_bytes(4, "little")
    + AUDIO_SR.to_bytes(4, "little")     # byte rate (8-bit mono)
    + (1).to_bytes(2, "little")          # block align
    + (8).to_bytes(2, "little")          # bits/sample
    + b"data"
    + AUDIO_SAMPLES.to_bytes(4, "little")
)

AUDIO_SCHEMA = (
    "doc_id long, sample_rate int, n_samples int, "
    "energy_sum long, max_frame_energy long"
)


def synthesize_wav_col(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a deterministic 'audio' binary column: a VALID 44-byte
    canonical WAV header (RIFF/WAVE, PCM, mono, 8 kHz, 8-bit) followed
    by 48 unsigned samples from an md5 chain over the text — same
    stand-in strategy as synthesize_blob_col, exercising a real
    container parse end to end."""
    samples = [
        F.unhex(F.md5(F.concat(F.col(text_col), F.lit(f"a{i}")))) for i in range(3)
    ]
    return df.withColumn("blob", F.concat(F.lit(_WAV_HEADER), *samples))


def parse_wav(blob: bytes) -> tuple[int, int, bytes]:
    """Pure-Python canonical-WAV parse (no audio libs, like
    decode_image): validates RIFF/WAVE magic, walks chunks to fmt/data,
    returns (sample_rate, n_samples, pcm bytes). 8-bit mono PCM only —
    swap for soundfile/librosa to widen support; the Arrow plumbing is
    identical either way."""
    if blob[0:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        size = int.from_bytes(blob[pos + 4 : pos + 8], "little")
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if int.from_bytes(body[0:2], "little") != 1:
                raise ValueError("not PCM")
            if int.from_bytes(body[2:4], "little") != 1:
                raise ValueError("not mono")
            if int.from_bytes(body[14:16], "little") != 8:
                raise ValueError("not 8-bit")
            rate = int.from_bytes(body[4:8], "little")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # RIFF chunks pad to even
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    return rate, len(data), data


def audio_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched frame-energy extraction: parse the WAV container,
    split PCM into AUDIO_FRAME-sample frames, energy = sum((s-128)^2)
    per frame — exact integers end to end (the audio twin of the
    image byte_sum discipline)."""
    for pdf in batches:
        rows = {k: [] for k in ("doc_id", "sample_rate", "n_samples",
                                "energy_sum", "max_frame_energy")}
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            rate, n, pcm = parse_wav(bytes(blob))
            fe = [
                sum((s - 128) * (s - 128) for s in pcm[i : i + AUDIO_FRAME])
                for i in range(0, n, AUDIO_FRAME)
            ]
            rows["doc_id"].append(doc_id)
            rows["sample_rate"].append(rate)
            rows["n_samples"].append(n)
            rows["energy_sum"].append(sum(fe))
            rows["max_frame_energy"].append(max(fe))
        yield pd.DataFrame(rows)


def audio_pipeline(docs: DataFrame) -> DataFrame:
    """doc_id/text -> per-clip audio features via synthesized WAV blobs
    + the real container parse."""
    blobs = synthesize_wav_col(docs).select("doc_id", "blob")
    return blobs.mapInPandas(audio_batches, AUDIO_SCHEMA)


# --- video scene-cut detection ----------------------------------------

SCENE_CUT_THRESHOLD = 600  # |Δ frame-brightness-sum| above this = a cut

SCENECUT_SCHEMA = "doc_id long, n_frames int, n_cuts int, max_jump long"


def scenecut_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: split each video at the repeated P6 headers
    (same boundary scan as framesample_batches), decode EVERY frame,
    and flag a scene cut wherever the absolute jump in frame brightness
    sum exceeds SCENE_CUT_THRESHOLD — the classic intensity-delta shot
    detector, exact because energies are integer byte sums."""
    for pdf in batches:
        out = {k: [] for k in ("doc_id", "n_frames", "n_cuts", "max_jump")}
        for doc_id, b in zip(pdf["doc_id"], pdf["video"]):
            frames = split_p6_frames(bytes(b))
            energies = [sum(decode_image(f)[3]) for f in frames]
            jumps = [abs(x - y) for x, y in zip(energies, energies[1:])]
            out["doc_id"].append(doc_id)
            out["n_frames"].append(len(frames))
            out["n_cuts"].append(sum(1 for j in jumps if j > SCENE_CUT_THRESHOLD))
            out["max_jump"].append(max(jumps) if jumps else 0)
        yield pd.DataFrame(out)


def scenecut_pipeline(docs: DataFrame) -> DataFrame:
    """documents -> synth video -> Arrow-batched per-video cut table."""
    with_video = synthesize_video_col(docs.select("doc_id", "text"))
    return with_video.select("doc_id", "video").mapInPandas(
        scenecut_batches, SCENECUT_SCHEMA
    )


# --- audio silence detection ------------------------------------------

SILENCE_THRESHOLD = 80_000  # frame energy below this = silence

SILENCE_SCHEMA = "doc_id long, n_frames int, n_silent int, longest_run int"


def audio_silence_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: parse the WAV, frame the PCM (same
    AUDIO_FRAME split as audio_batches), flag frames whose exact
    integer energy falls below SILENCE_THRESHOLD, and report the
    silent-frame count plus the longest consecutive silent run — the
    trim/VAD primitive an audio-curation pipeline runs before any
    model sees a clip."""
    for pdf in batches:
        rows = {k: [] for k in ("doc_id", "n_frames", "n_silent", "longest_run")}
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            rate, n, pcm = parse_wav(bytes(blob))
            fe = [
                sum((s - 128) * (s - 128) for s in pcm[i : i + AUDIO_FRAME])
                for i in range(0, n, AUDIO_FRAME)
            ]
            sil = [e < SILENCE_THRESHOLD for e in fe]
            best = cur = 0
            for flag in sil:
                cur = cur + 1 if flag else 0
                best = max(best, cur)
            rows["doc_id"].append(doc_id)
            rows["n_frames"].append(len(fe))
            rows["n_silent"].append(sum(sil))
            rows["longest_run"].append(best)
        yield pd.DataFrame(rows)


def audio_silence_pipeline(docs: DataFrame) -> DataFrame:
    """doc_id/text -> synthesized WAV -> per-clip silence features."""
    blobs = synthesize_wav_col(docs).select("doc_id", "blob")
    return blobs.mapInPandas(audio_silence_batches, SILENCE_SCHEMA)
