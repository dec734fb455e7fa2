"""Stream-static enrichment join.

The standard ingestion pattern: each arriving micro-batch joins against
a slowly-changing static dimension (quality scores, dedup indexes,
lang-id models' outputs). Stream-static joins are stateless — no
watermark, no state store — because only the stream side is unbounded;
Spark re-plans the static side per micro-batch, so a small dimension is
broadcast each batch and a large one sort-merge-joins against the batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream_df: DataFrame,
    static_df: DataFrame,
    key: str = "doc_id",
    broadcast: bool = True,
    how: str = "inner",
) -> DataFrame:
    """Join each micro-batch with the static table on ``key``.
    ``broadcast=True`` pins the broadcast hint for dimension-sized
    static sides (skip it for static tables near/above the executor
    memory budget — they then sort-merge per batch)."""
    right = F.broadcast(static_df) if broadcast else static_df
    return stream_df.join(right, key, how)
