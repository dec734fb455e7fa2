"""Multimodal column plumbing ([ext] training-data set).

Images/audio/video are opaque BINARY columns + typed metadata. The
Spark-side plumbing (schemas, Arrow batch shapes, partition-preserving
mapInPandas kernels) is real and tested; the actual codec step is STUBBED
(no image/audio libraries in this container): ``decode_image`` raises
NotImplementedError unless ``fake=True``, in which case a deterministic
fake decoder (bytes -> tiled uint8 "pixels") exercises the full path.
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


_FEAT_SCHEMA = "doc_id bigint, height int, width int, mean_px double, feat array<double>"


def decode_image(blobs: DataFrame, *, fake: bool = False, side: int = 8) -> DataFrame:
    """Decode + feature-extract, Arrow-batched. Real decoders (PIL/ffmpeg)
    are absent here — ``fake=True`` uses a deterministic stand-in that
    tiles the raw bytes into a (side x side) uint8 'image' so the batch
    shapes, schema, and partitioning are exercised end-to-end."""
    if not fake:
        raise NotImplementedError(
            "no image codec in this environment; pass fake=True for the "
            "deterministic stand-in decoder"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        npx = side * side
        for pdf in batches:
            if pdf.empty:
                continue
            out = {"doc_id": pdf["doc_id"], "height": side, "width": side}
            mats = []
            for b in pdf["blob"]:
                raw = np.frombuffer(bytes(b), dtype=np.uint8)
                tiled = np.resize(raw, npx).astype(np.float64)
                mats.append(tiled)
            m = np.stack(mats)
            out["mean_px"] = m.mean(axis=1)
            # 'feature' = per-row histogram over 8 bins, L1-normalized
            hist = np.stack(
                [np.histogram(r, bins=8, range=(0, 256))[0] for r in m]
            ).astype(np.float64)
            hist /= np.maximum(hist.sum(axis=1, keepdims=True), 1.0)
            out["feat"] = list(hist)
            yield pd.DataFrame(out)

    return blobs.select("doc_id", "blob").mapInPandas(kernel, schema=_FEAT_SCHEMA)


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
