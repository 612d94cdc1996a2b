"""Streaming sessionization — the Structured-Streaming twin of
``operators/sessions.py`` (batch gap-based sessionize; SURVEY.md §2.10).

Uses Spark's native ``session_window``: per user, events whose event-time
gaps are <= the gap duration merge into one growing window; the watermark
closes a session once no in-order event can extend it, emitting its rollup
row exactly once (append mode + parquet sink commit log). State per user is
one open window — bounded at any stream length, the same property the
windowed metrics stream relies on.

Batch/stream parity: a closed session here equals one ``session_rollup``
group over the same events (asserted in tests); the batch operator remains
the backfill/repair path over historical parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SESSION_EVENT_SCHEMA = "user_id long, event_id long, ts timestamp"


def session_rollup_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per closed (user, session): event count + window span."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def run_session_stream(
    spark: SparkSession,
    events_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> None:
    """Drain available event files into closed-session rollup rows."""
    stream = spark.readStream.schema(SESSION_EVENT_SCHEMA).parquet(events_dir)
    q = (
        session_rollup_stream(stream, gap=gap, watermark=watermark)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
