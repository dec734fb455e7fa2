"""Deterministic file-source micro-batch fixtures.

One parquet FILE per micro-batch (``maxFilesPerTrigger=1``), ordered by
explicitly assigned mtimes (the file source lists oldest-first) — no
wall-clock sleeping. Shared by the driver oracle harness and the
streaming tests so the staging/move/utime sequence has exactly one
implementation.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame

_MTIME_BASE = 1_700_000_000.0
_MTIME_STEP = 10.0


def write_batch_file(df: DataFrame, d: str, index: int) -> str:
    """Write ``df`` as the single file ``d/batch_{index:05d}.parquet``
    with mtime base + 10s * index; returns the file path. Indices must
    be unique per directory — they ARE the batch order."""
    os.makedirs(d, exist_ok=True)
    sub = os.path.join(d, f"_stage{index}")
    df.coalesce(1).write.mode("overwrite").parquet(sub)
    (part,) = glob.glob(os.path.join(sub, "part-*.parquet"))
    dst = os.path.join(d, f"batch_{index:05d}.parquet")
    os.replace(part, dst)
    shutil.rmtree(sub)
    t = _MTIME_BASE + _MTIME_STEP * index
    os.utime(dst, (t, t))
    return dst
