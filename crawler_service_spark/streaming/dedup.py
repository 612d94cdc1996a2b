"""Streaming exact dedup: first-occurrence-only emission ACROSS micro-batches.

The batch side of the repo dedupes a static corpus (operators/docdedup.py) or
an iterating frontier (operators/dedup.py seen-filters); when ingest is a
stream (a rolling crawl feed), "have we seen this content before" must live in
Structured Streaming's checkpointed state store so it survives micro-batch
boundaries and process restarts (SURVEY.md §2.10; ref analogue: the long-poll
worker's dedup-before-work, legacy/posix_crawler.py:131).

``dedup_stream`` groups the document stream by content hash and admits, per
hash, only the first arrival ever (min doc_id within the micro-batch, state
thereafter): the streaming twin of ``docdedup.exact_dedup``.

Scale shape: state is one (flag, keeper) pair per DISTINCT content hash,
sharded across executors by the state store on the group key (uniform md5 —
skew-free). At 10^10 docs the lever is the RocksDB state store provider
(`spark.sql.streaming.stateStore.providerClass`) so state spills to executor
disk, plus a retention policy (drop state for hashes older than the dedup
horizon) if the feed is unbounded. Rows process vectorized — whole pandas
frame per group per batch, no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, text string"
OUT_SCHEMA = "doc_id long, text_hash string"
STATE_SCHEMA = "keeper long"


def _first_only(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if state.exists:
        # hash already admitted in an earlier micro-batch: emit nothing; the
        # existing state persists untouched (no redundant state-store write
        # on the hot re-seen path)
        return
    if chunks:
        allrows = pd.concat(chunks, ignore_index=True)
        keeper = allrows.loc[allrows["doc_id"].idxmin()]
        state.update((int(keeper["doc_id"]),))
        yield pd.DataFrame(
            {"doc_id": [int(keeper["doc_id"])], "text_hash": [key[0]]}
        )


def dedup_stream(
    spark: SparkSession,
    in_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain available document files through the cross-batch first-occurrence
    gate into a parquet sink. Exactly-once end to end: the checkpoint dedupes
    input files, the state store holds the seen-hash set, and the file sink's
    commit log fences output."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .parquet(in_dir)
        .withColumn("text_hash", F.md5("text"))
    )
    gated = stream.groupBy("text_hash").applyInPandasWithState(
        _first_only,
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


def read_deduped(spark: SparkSession, sink_dir: str) -> DataFrame:
    return spark.read.parquet(sink_dir)
