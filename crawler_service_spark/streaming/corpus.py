"""Streaming corpus ingest: quality gate -> PII scrub -> cross-batch dedup.

The batch side composes these stages in ``pipeline_training_mix``
(__spark_entry__.py); when the corpus arrives as a rolling feed (a live crawl
dumping document files), the same pipeline must run incrementally with the
seen-content set in Structured Streaming's checkpointed state store
(SURVEY.md §2.10; the streaming twin of the batch gate->scrub->dedup chain).

Per micro-batch, each document flows through:
  1. the Gopher quality gate (``textquality.gopher_quality`` — per-row JVM
     projections, streaming-safe by construction: no aggregation, no window),
  2. PII redaction (``textquality.pii_redact_cols`` — the identical
     email -> IPv4 -> phone sequence the batch ``pii_scrub`` applies),
  3. a cross-batch first-occurrence gate on the md5 of the REDACTED text
     (dedup after scrub, so two docs differing only in redacted PII
     collapse), keeping the minimum doc_id ever seen for each hash.

Only gate-passing, first-occurrence docs reach the parquet sink, carrying
their PII counts. Exactly-once end to end: the checkpoint dedupes input
files, the state store holds the seen-hash set across restarts, and the file
sink's commit log fences output — re-running after a crash emits nothing new.

Scale shape: stages 1-2 are stateless whole-stage-codegen maps; state is one
(keeper) row per distinct content hash sharded on the uniform md5 key (same
levers as streaming/dedup.py: RocksDB state store + retention horizon for
unbounded feeds).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import textquality

DOC_SCHEMA = "doc_id long, text string"
OUT_SCHEMA = (
    "doc_id long, text string, n_emails long, n_ips long, n_phones long, "
    "text_hash string"
)
STATE_SCHEMA = "keeper long"
_OUT_COLS = ["doc_id", "text", "n_emails", "n_ips", "n_phones", "text_hash"]


def _first_full(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    """Admit the min-doc_id row for a never-seen hash; emit nothing (and
    leave state untouched) on the hot re-seen path."""
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if state.exists:
        return
    if chunks:
        allrows = pd.concat(chunks, ignore_index=True)
        keeper = allrows.loc[allrows["doc_id"].idxmin()]
        state.update((int(keeper["doc_id"]),))
        yield pd.DataFrame([[keeper[c] for c in _OUT_COLS]], columns=_OUT_COLS)


def corpus_ingest_stream(
    spark: SparkSession,
    in_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain available document files through gate -> scrub -> dedup into a
    parquet sink (availableNow trigger; call again as more files land)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = spark.readStream.schema(DOC_SCHEMA).parquet(in_dir)
    gated = (
        textquality.gopher_quality(stream, keep=("text",))
        .filter(F.col("gopher_pass"))
        .select("doc_id", "text")
    )
    n_emails, n_ips, n_phones, redacted = textquality.pii_redact_cols(F.col("text"))
    scrubbed = gated.select(
        "doc_id",
        redacted.alias("text"),
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"),
        n_phones.cast("long").alias("n_phones"),
    ).withColumn("text_hash", F.md5("text"))
    kept = scrubbed.groupBy("text_hash").applyInPandasWithState(
        _first_full,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        kept.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_corpus(spark: SparkSession, sink_dir: str) -> DataFrame:
    return spark.read.parquet(sink_dir)
