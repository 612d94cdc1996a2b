"""Watermarked event-time windowed aggregation over the crawl event stream.

The reference reports progress with wall-clock counters printed every N files
(crawlers/local_posix.py:115-116, legacy/globus/globus_crawler.py:127-128).
The Spark-native form of "progress metrics over an unbounded stream" is an
EVENT-TIME windowed aggregation with a watermark: fetch events arrive out of
order (parallel workers), late events within the watermark still land in
their window, and state for closed windows is dropped instead of growing
forever — the property that matters at 10^10 events.

Append output mode + watermark means a window only emits once it can no
longer change (watermark passed window end) — exactly-once window rows in
the parquet sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = "host string, url string, fetched_at timestamp, bytes long, ok boolean"


def windowed_fetch_metrics(
    events: DataFrame,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per (window, host) fetch metrics with late-data tolerance = watermark."""
    return (
        events.withWatermark("fetched_at", watermark)
        .groupBy(F.window("fetched_at", window_duration).alias("w"), "host")
        .agg(
            F.count("*").alias("n_fetches"),
            F.sum(F.col("ok").cast("long")).alias("n_ok"),
            F.sum("bytes").alias("bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host", "n_fetches", "n_ok", "bytes",
        )
    )


def run_windowed_metrics_stream(
    spark: SparkSession,
    events_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> None:
    """Drain available event files into watermarked windowed metrics.

    Append mode: a (window, host) row reaches the sink exactly once, when the
    watermark closes the window; events later than the watermark are dropped
    by the state store (bounded state at any stream length)."""
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(events_dir)
    q = (
        windowed_fetch_metrics(stream, window_duration, watermark)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
