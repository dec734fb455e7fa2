"""Event-time windowed aggregation with watermarking — the Structured
Streaming analytics primitive the batch events_hourly query mirrors.

Append-mode semantics (the scale-relevant part): a window row is emitted
exactly once, when the watermark (max seen event time minus the
configured delay) passes the window end — so state is bounded by the
number of OPEN windows, not by history, and late rows beyond the delay
are dropped instead of growing state. With Trigger.AvailableNow the
final batch advances the watermark to (max ts - delay) and flushes every
window that closed before it; the window containing the stream's last
event stays open (its end exceeds the final watermark) and is NOT
emitted — the DuckDB oracle applies the same cutoff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_agg_stream(
    stream_df: DataFrame,
    watermark: str = "0 seconds",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """(hour, event_type, n, sum_value) per CLOSED 1-hour event-time
    window — the streaming twin of the batch events_hourly aggregation."""
    # watermarks require TIMESTAMP; parquet event times arrive as
    # TIMESTAMP_NTZ — value-preserving cast under the UTC-pinned session
    stream_df = stream_df.withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    )
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), "1 hour"), F.col(type_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("hour"),
            F.col(type_col).alias("event_type"),
            "n",
            "sum_value",
        )
    )
