"""Custom stateful streaming operator: per-host budget enforced ACROSS
micro-batches (SURVEY.md §2.10; the task brief's 'applyInPandasWithState for
custom stateful operators').

The reference enforces politeness budgets with in-memory per-host counters
inside its long-poll worker loop (crawlers/globus_base_preserved.py:256-351);
when ingest is a stream, that counter must survive micro-batch boundaries and
process restarts — i.e. live in Structured Streaming's checkpointed state
store. ``budget_gate_stream`` is the Spark-native form: group the incoming
URL stream by host, and an ``applyInPandasWithState`` stage admits rows until
the host's lifetime budget is spent, carrying the spent-count in state.

Scale shape: state is one long per host (pruned/compacted by the state
store), the stream shuffles once on host, and each group processes its rows
vectorized (whole pandas frame per batch, no per-row Python). The parquet
file sink gives exactly-once output via its own commit log.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..functions.urls import canonicalize_url_col, host_col
from .ingest import SEED_SCHEMA

OUT_SCHEMA = "crawl_id string, url string, seed_order long, host string"
STATE_SCHEMA = "taken long"


def _gate(budget_per_host: int):
    def gate(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        taken = state.get[0] if state.exists else 0
        # materialize the group's micro-batch before admitting: a host's rows
        # can arrive as several Arrow chunks in arbitrary order, and admission
        # must be by global seed_order within the batch, not per-chunk.
        # Politeness groups are budget-bounded, so this stays small.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            allrows = pd.concat(chunks, ignore_index=True).sort_values(
                ["seed_order", "url"]
            )
            take = allrows.head(max(0, budget_per_host - taken))
            taken += len(take)
            if len(take):
                yield take[["crawl_id", "url", "seed_order", "host"]]
        state.update((taken,))

    return gate


def budget_gate_stream(
    spark: SparkSession,
    seed_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    budget_per_host: int,
) -> None:
    """Drain available seed files through the stateful per-host budget gate
    into a parquet sink. Idempotent and budget-exact across calls: input
    files are deduped by the streaming checkpoint, the per-host spent-count
    lives in the checkpointed state store, and the file sink's commit log
    makes output exactly-once."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = (
        spark.readStream.schema(SEED_SCHEMA)
        .parquet(seed_dir)
        .withColumn("url", canonicalize_url_col("url"))
        .withColumn("host", host_col("url"))
    )
    gated = stream.groupBy("host").applyInPandasWithState(
        _gate(budget_per_host),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        gated.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_gated_sink(spark: SparkSession, sink_dir: str) -> DataFrame:
    return spark.read.parquet(sink_dir)
