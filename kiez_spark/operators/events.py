"""Event-stream relational operators ([ext] training-data set).

Sessionization — the standard clickstream/activity primitive: events of
one user separated by more than ``gap`` belong to different sessions.
One shuffle (hash on user_id), two windows over the SAME partitioning
(lag -> boundary flag, running sum -> session index), so Catalyst plans
a single Exchange + one Sort for both window frames. Deterministic
ordering: (ts, event_id) — equal timestamps cannot reorder sessions
across runs or engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ts_micros(col):
    """Integer epoch microseconds of a timestamp column. Parquet
    timestamps load as TIMESTAMP_NTZ (no zone), which unix_micros
    rejects; the cast to TIMESTAMP is value-preserving because
    session.py pins spark.sql.session.timeZone to UTC."""
    return F.unix_micros(col.cast("timestamp"))


def sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(event_id, user_id, ts, session_idx, is_session_start):
    session_idx numbers each user's sessions 1..n in time order."""
    order = [F.col(ts_col).asc(), F.col(id_col).asc()]
    w = Window.partitionBy(user_col).orderBy(*order)
    # integer microseconds on both engines (unix_micros / epoch_us):
    # the gap comparison is integer-exact, never float-rounded
    gap_us = int(gap_minutes * 60.0 * 1_000_000)
    us = ts_micros(F.col(ts_col))
    prev_us = F.lag(us).over(w)
    new_sess = F.when(
        prev_us.isNull() | ((us - prev_us) > gap_us), 1
    ).otherwise(0)
    wsum = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    flagged = events.withColumn("_new", new_sess)
    return flagged.select(
        F.col(id_col).cast("bigint").alias("event_id"),
        F.col(user_col).cast("bigint").alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.sum("_new").over(wsum).cast("int").alias("session_idx"),
        (F.col("_new") == 1).alias("is_session_start"),
    )


def session_stats(
    events: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(user_id, session_idx, n_events, start_ts, end_ts, duration_sec)
    — one row per session, composed on top of sessionize (the window
    partitioning is reused by the groupBy: same keys prefix, no extra
    wide shuffle of the event rows beyond the sessionize exchange)."""
    s = sessionize(events, gap_minutes, user_col, ts_col, id_col)
    return s.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        F.round(
            (
                F.max(ts_micros(F.col("ts")))
                - F.min(ts_micros(F.col("ts")))
            )
            / 1_000_000.0,
            6,
        ).alias("duration_sec"),
    )
