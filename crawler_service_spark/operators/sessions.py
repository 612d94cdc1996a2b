"""Gap-based sessionization over an event stream — the classic windowed
analytics operator (ref analogue: the crawl-status poll loop groups worker
heartbeats into liveness epochs the same way; SURVEY.md §2.5/§2.10).

``sessionize`` assigns a session id per (user, run of events whose
inter-event gap <= ``gap_seconds``): a lag window marks session starts, a
running sum over the marks numbers the sessions, one shuffle on user_id.
``session_rollup`` aggregates each session to its span + event count.

Scale shape: both stages share the user_id partitioning (the rollup groupBy
reuses the window's shuffle), keys are uniform user ids, and all expressions
are JVM built-ins. The streaming twin is Structured Streaming's native
``session_window`` (windowed.py covers the watermarked path); this is the
batch/backfill form every clickstream pipeline keeps alongside it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch(ts_col: str) -> Column:
    # TIMESTAMP_NTZ cannot cast straight to BIGINT (Spark 4); route through
    # TIMESTAMP — the session tz is pinned to UTC (session.py), so this is
    # the same epoch DuckDB's epoch() yields on the NTZ parquet column.
    return F.col(ts_col).cast("timestamp").cast("long")


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """events + ``session_id`` (1-based per user, ordered by (ts, order_col);
    ``order_col`` is the deterministic tie-breaker for equal timestamps)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    gap = _epoch(ts_col) - F.lag(_epoch(ts_col)).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )


def session_rollup(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """One row per session: (user_id, session_id, n_events, start/end epoch,
    duration_s)."""
    s = sessionize(
        events, gap_seconds=gap_seconds, user_col=user_col, ts_col=ts_col,
        order_col=order_col,
    )
    return (
        s.groupBy(user_col, "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(_epoch(ts_col)).alias("start_epoch"),
            F.max(_epoch(ts_col)).alias("end_epoch"),
        )
        .withColumn("duration_s", F.col("end_epoch") - F.col("start_epoch"))
    )
