"""Multimodal column plumbing ([ext] training-data set).

Images/audio/video are opaque BINARY columns + typed metadata. The
Spark-side plumbing (schemas, Arrow batch shapes, partition-preserving
mapInPandas kernels) is real and tested. Decoding:

- REAL path: pure-python parsers for the uncompressed container formats
  — binary P6 PPM images (``decode_image``) and PCM16 RIFF/WAVE audio
  (``decode_audio``) — so the decode step is executable end-to-end in
  this codec-less container. ``synth_ppm_blobs`` / ``synth_wav_blobs``
  build REAL such files as Spark binary-concat column expressions (no
  python in the synth path), deterministic from the text column.
- Compressed formats (JPEG/PNG/MP3/...) still raise NotImplementedError
  (no codec libraries here); ``fake=True`` keeps the deterministic
  stand-in decoder for arbitrary blobs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_SCHEMA = (
    "doc_id bigint, blob binary, media_type string, n_bytes bigint, sha string"
)


def pack_blobs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    media_type: str = "application/octet-stream",
) -> DataFrame:
    """Synthesize a binary media column from text (the container has no
    real media); metadata columns are the real contract."""
    blob = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        blob.alias("blob"),
        F.lit(media_type).alias("media_type"),
        F.length(blob).cast("bigint").alias("n_bytes"),
        F.sha2(blob, 256).alias("sha"),
    )


_FEAT_SCHEMA = (
    "doc_id bigint, height int, width int, mean_px double, "
    "px_sum bigint, px_n bigint, feat array<double>"
)


def synth_ppm_blobs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    side: int = 8,
) -> DataFrame:
    """REAL binary P6 PPM files as a Spark binary column — header
    'P6\\n<w> <h>\\n255\\n' + side*side*3 raw RGB bytes (the text's first
    bytes, space-padded; driver corpora are ASCII so chars == bytes).
    Pure column exprs: the synth path stays JVM-side."""
    npx = side * side * 3
    payload = F.encode(
        F.rpad(F.substring(F.col(text_col), 1, npx), npx, " "), "utf-8"
    )
    blob = F.concat(F.encode(F.lit(f"P6\n{side} {side}\n255\n"), "utf-8"), payload)
    return df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        blob.alias("blob"),
        F.lit("image/x-portable-pixmap").alias("media_type"),
        F.length(blob).cast("bigint").alias("n_bytes"),
        F.sha2(blob, 256).alias("sha"),
    )


def _parse_ppm(raw: bytes) -> tuple[int, int, np.ndarray]:
    """(width, height, float gray[h*w]) from a binary P6 PPM. Whitespace
    (incl. single-line '#' comments) per the netpbm spec; maxval <= 255."""
    if raw[:2] != b"P6":
        raise NotImplementedError(
            "only binary PPM (P6) decoding is implemented in this "
            "codec-less environment; pass fake=True for other formats"
        )
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        if raw[pos : pos + 1] == b"#":  # comment to end-of-line
            while pos < len(raw) and raw[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(raw[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    px = np.frombuffer(raw, dtype=np.uint8, count=w * h * 3, offset=pos)
    gray = px.astype(np.float64).reshape(-1, 3).mean(axis=1)
    return w, h, gray, int(px.sum(dtype=np.int64))


def _features_from_gray(doc_ids, whs, grays, px_sums, px_ns):
    feats = []
    for g in grays:
        hist = np.histogram(g, bins=8, range=(0, 256))[0].astype(np.float64)
        feats.append(hist / max(hist.sum(), 1.0))
    return pd.DataFrame(
        {
            "doc_id": doc_ids,
            "height": pd.array([h for _, h in whs], dtype="int32"),
            "width": pd.array([w for w, _ in whs], dtype="int32"),
            "mean_px": [float(g.mean()) for g in grays],
            # exact integer (byte-sum, byte-count) pair: mean_px ==
            # px_sum/px_n exactly, so downstream consumers that must hash
            # identically across engines can derive an integer-division
            # mean instead of rounding a double ratio (1-ulp hazard)
            "px_sum": pd.array(px_sums, dtype="int64"),
            "px_n": pd.array(px_ns, dtype="int64"),
            "feat": feats,
        }
    )


def decode_image(blobs: DataFrame, *, fake: bool = False, side: int = 8) -> DataFrame:
    """Decode + feature-extract, Arrow-batched. The REAL path parses
    binary P6 PPM (pure python — see module docstring); compressed
    formats raise NotImplementedError. ``fake=True`` keeps the
    deterministic stand-in (raw bytes tiled into a side x side 'image')
    for arbitrary blobs. Features: mean gray level + an L1-normalized
    8-bin gray histogram."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        npx = side * side
        for pdf in batches:
            if pdf.empty:
                continue
            if fake:
                grays = [
                    np.resize(
                        np.frombuffer(bytes(b), dtype=np.uint8), npx
                    ).astype(np.float64)
                    for b in pdf["blob"]
                ]
                whs = [(side, side)] * len(pdf)
                px_sums = [int(g.sum()) for g in grays]
                px_ns = [npx] * len(pdf)
            else:
                whs, grays, px_sums, px_ns = [], [], [], []
                for b in pdf["blob"]:
                    w, h, gray, psum = _parse_ppm(bytes(b))
                    whs.append((w, h))
                    grays.append(gray)
                    px_sums.append(psum)
                    px_ns.append(w * h * 3)
            yield _features_from_gray(pdf["doc_id"], whs, grays, px_sums, px_ns)

    return blobs.select("doc_id", "blob").mapInPandas(kernel, schema=_FEAT_SCHEMA)


_AUDIO_SCHEMA = (
    "doc_id bigint, sample_rate int, n_channels int, n_samples bigint, "
    "mean_amp double, amp_sum bigint, rms double"
)


def synth_wav_blobs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n_samples: int = 128, sample_rate: int = 8000,
) -> DataFrame:
    """REAL PCM16 mono RIFF/WAVE files as a Spark binary column: a
    44-byte canonical header + n_samples little-endian int16 samples
    whose LOW bytes are the text's first bytes (space-padded) and high
    bytes are zero — so every sample value equals its text byte
    (SQL-checkable). Header fields are fixed-width little-endian ints
    built with unhex, all column-expression work."""
    import struct

    data_bytes = n_samples * 2
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + data_bytes) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                sample_rate * 2, 2, 16)
        + b"data" + struct.pack("<I", data_bytes)
    )
    # interleave each low (text) byte with a zero high byte so the
    # little-endian int16 sample value equals the text byte — built as a
    # transform over byte positions, still pure column exprs
    pairs = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(n_samples)),
            lambda i: F.concat(
                F.substring(F.col("_lo_str"), i, F.lit(1)), F.lit("\x00")
            ),
        ),
        "",
    )
    tmp = df.withColumn(
        "_lo_str", F.rpad(F.substring(F.col(text_col), 1, n_samples),
                          n_samples, " ")
    ).withColumn("_pcm", F.encode(pairs, "utf-8"))
    blob = F.concat(F.lit(hdr), F.col("_pcm"))
    return tmp.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        blob.alias("blob"),
        F.lit("audio/wav").alias("media_type"),
        F.length(blob).cast("bigint").alias("n_bytes"),
        F.sha2(blob, 256).alias("sha"),
    )


def decode_audio(blobs: DataFrame, *, fake: bool = False) -> DataFrame:
    """Parse PCM16 RIFF/WAVE (pure python: header walk over the chunk
    list, numpy int16 view of the data chunk) into per-doc audio
    features. Compressed audio raises NotImplementedError; ``fake=True``
    treats the raw blob bytes as unsigned 8-bit samples at 8kHz."""

    def parse_wav(raw: bytes):
        import struct

        if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
            raise NotImplementedError(
                "only PCM RIFF/WAVE decoding is implemented in this "
                "codec-less environment; pass fake=True for other formats"
            )
        pos, rate, channels, bits, data = 12, None, None, None, None
        while pos + 8 <= len(raw):
            cid = raw[pos : pos + 4]
            (size,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
            body = raw[pos + 8 : pos + 8 + size]
            if cid == b"fmt ":
                fmt_tag, channels, rate = struct.unpack("<HHI", body[:8])
                (bits,) = struct.unpack("<H", body[14:16])
                if fmt_tag != 1 or bits != 16:
                    raise NotImplementedError("only PCM16 supported")
            elif cid == b"data":
                data = body
            pos += 8 + size + (size % 2)  # chunks are word-aligned
        if rate is None or data is None:
            raise NotImplementedError("missing fmt/data chunk")
        samples = np.frombuffer(
            data, dtype="<i2", count=len(data) // 2
        ).astype(np.float64)
        return rate, channels, samples

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = {"doc_id": pdf["doc_id"], "sample_rate": [],
                    "n_channels": [], "n_samples": [], "mean_amp": [],
                    "amp_sum": [], "rms": []}
            for b in pdf["blob"]:
                raw = bytes(b)
                if fake:
                    rate, ch = 8000, 1
                    samples = np.frombuffer(raw, dtype=np.uint8).astype(
                        np.float64
                    )
                else:
                    rate, ch, samples = parse_wav(raw)
                rows["sample_rate"].append(rate)
                rows["n_channels"].append(ch)
                rows["n_samples"].append(len(samples))
                rows["mean_amp"].append(
                    float(samples.mean()) if len(samples) else 0.0
                )
                # exact integer sample sum (samples are int16/uint8-valued
                # floats): mean_amp == amp_sum/n_samples exactly, letting
                # cross-engine consumers derive an integer-division mean
                # instead of rounding a double ratio
                rows["amp_sum"].append(int(samples.sum(dtype=np.float64)))
                rows["rms"].append(
                    float(np.sqrt((samples**2).mean())) if len(samples) else 0.0
                )
            rows["sample_rate"] = pd.array(rows["sample_rate"], dtype="int32")
            rows["n_channels"] = pd.array(rows["n_channels"], dtype="int32")
            rows["amp_sum"] = pd.array(rows["amp_sum"], dtype="int64")
            yield pd.DataFrame(rows)

    return blobs.select("doc_id", "blob").mapInPandas(kernel, schema=_AUDIO_SCHEMA)


_FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame binary"


def frame_sample(blobs: DataFrame, n_frames: int = 4, frame_bytes: int = 64) -> DataFrame:
    """Deterministic 'video frame' sampling: n equally-spaced byte windows
    per blob — the partition/batch plumbing of a real frame sampler."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, idxs, frames = [], [], []
            for did, b in zip(pdf["doc_id"], pdf["blob"]):
                raw = bytes(b)
                if not raw:
                    continue
                step = max(1, (len(raw) - frame_bytes) // max(1, n_frames - 1))
                for i in range(n_frames):
                    lo = min(i * step, max(0, len(raw) - 1))
                    ids.append(did)
                    idxs.append(i)
                    frames.append(raw[lo : lo + frame_bytes])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": pd.array(idxs, dtype="int32"),
                 "frame": frames}
            )

    return blobs.select("doc_id", "blob").mapInPandas(kernel, schema=_FRAME_SCHEMA)
