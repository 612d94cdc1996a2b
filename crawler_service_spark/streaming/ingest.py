"""Structured-Streaming seed/frontier ingest (SURVEY.md §2.1 S1, §2.10 T1).

The reference's task source is an SQS long-poll loop (utils/sqs_utils.py:47-61)
feeding crawl tasks into workers. The Spark-native equivalent for continuously
arriving seed lists is a file-source stream: drop parquet seed batches into a
directory, and each micro-batch is canonicalized, robots-filtered, deduplicated
in-batch, and appended to the frontier via ``foreachBatch`` —
``Trigger.AvailableNow`` gives the same "drain what's there, then stop"
semantics as the reference's ``WaitTimeSeconds`` long poll with empty-poll
termination (application.py:194-215).

Exactly-once per file: the streaming checkpoint dedupes *inputs*, and the
sink write is made idempotent by ``batch_id`` — each micro-batch overwrites
its own deterministic ``batch-{id}`` subdirectory, so a crash between the
sink write and the checkpoint commit replays into the same directory instead
of appending duplicates. Readers load the sink with
``spark.read.option("recursiveFileLookup", "true").parquet(sink_dir)``
(helper: ``read_seed_sink``).

The crawl loop itself stays batch-iterative by design (each iteration must be
a resumable, deterministic DataFrame job — SURVEY.md §2.10); streaming covers
the *ingest edge* where new work arrives asynchronously.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urls import canonicalize_url_col, host_col, path_col, url_hash_col
from ..operators import politeness

SEED_SCHEMA = "crawl_id string, url string, seed_order long"


def ingest_seed_stream(
    spark: SparkSession,
    seed_dir: str,
    robots: DataFrame,
    checkpoint_dir: str,
    sink_dir: str,
) -> int:
    """Drain all currently-available seed files into the frontier staging sink.

    Returns the number of micro-batches processed. Idempotent across calls:
    already-ingested files are remembered in the streaming checkpoint.
    """
    n_batches = 0

    def handle_batch(batch: DataFrame, batch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        s = batch.select(
            "crawl_id",
            canonicalize_url_col("url").alias("url"),
            F.col("seed_order").cast("long").alias("seed_order"),
        )
        s = (
            s.withColumn("host", host_col("url"))
            .withColumn("path", path_col("url"))
            .withColumn("url_hash", url_hash_col("url"))
        )
        s = politeness.robots_filter(s, robots)
        s = s.groupBy("crawl_id", "url", "url_hash", "host", "path").agg(
            F.min("seed_order").alias("seed_order")
        )
        # idempotent by batch_id: a replayed batch overwrites its own subdir
        s.write.mode("overwrite").parquet(os.path.join(sink_dir, f"batch-{batch_id}"))

    os.makedirs(sink_dir, exist_ok=True)  # sink readable even if zero batches
    stream = (
        spark.readStream.schema(SEED_SCHEMA)
        .parquet(seed_dir)
        .writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination()
    return n_batches


def read_seed_sink(spark: SparkSession, sink_dir: str) -> DataFrame:
    """Read the staged frontier rows across all per-batch subdirectories."""
    return spark.read.option("recursiveFileLookup", "true").parquet(sink_dir)
