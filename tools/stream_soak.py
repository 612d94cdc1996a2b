"""Streaming corpus-ingest soak: 40 micro-batches through gate->scrub->dedup.

The streaming corpus pipeline (streaming/corpus.py) is unit-tested at 3
batches; this drives 40 availableNow drain cycles with a growing seen-hash
state store and asserts the claims that matter at depth:

  - **global first-occurrence**: every batch re-sends a slice of earlier
    content (cross-batch dups) plus fresh docs; the sink must hold exactly
    one row per distinct redacted text, with the minimum doc_id ever seen;
  - **exactly-once across restarts**: each cycle is a fresh query start
    against the same checkpoint (the unit test's restart case, 40 times);
  - **cost ∝ batch, not state**: per-cycle wall must stay flat while the
    state store grows from 2k to ~40k hashes — if admission cost scaled
    with accumulated state the last deciles would climb.

Usage: PYTHONPATH=/root/repo python tools/stream_soak.py
Env: STREAM_SOAK_BATCHES (40), STREAM_SOAK_DOCS (2000), SPARK_GRAFT_CPUS (8
— streaming micro-batches are driver-heavy; more cores buy nothing here).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crawler_service_spark.session import get_spark
from crawler_service_spark.streaming import corpus_ingest_stream, read_corpus

BATCHES = int(os.environ.get("STREAM_SOAK_BATCHES", "40"))
DOCS = int(os.environ.get("STREAM_SOAK_DOCS", "2000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
WORK = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    ".cache", "stream_soak")

BASE = ("the quick brown fox and the lazy dog of the farm ran to a barn "
        "near the river and the miller took a sack of grain to the market "
        "while the sun rose over the quiet hills and a cold wind moved "
        "through the tall dry grass beside the old stone wall of the keep")


def batch_docs(spark, b: int):
    """Batch b: DOCS docs. 25% re-send content from batch b-1 (cross-batch
    dups, higher doc_ids — must NOT displace the earlier keeper), 75% fresh
    content unique to (b, i); every doc passes the Gopher gate and carries
    one synthetic email so the scrub path stays hot."""
    start = b * DOCS
    df = spark.range(start, start + DOCS).select(F.col("id").alias("doc_id"))
    i = F.col("doc_id") % DOCS
    content_batch = F.when((i % 4 == 0) & (F.lit(b) > 0), F.lit(b - 1)).otherwise(F.lit(b))
    text = F.concat(
        F.lit(BASE + " topic "),
        content_batch.cast("string"),
        F.lit("-"),
        (i % (DOCS // 2)).cast("string"),
        F.lit(" mail u"),
        content_batch.cast("string"),
        F.lit("x"),
        (i % (DOCS // 2)).cast("string"),
        F.lit("@example.org"),
    )
    return df.select("doc_id", text.alias("text"))


def main() -> None:
    shutil.rmtree(WORK, ignore_errors=True)
    in_dir = os.path.join(WORK, "in")
    sink = os.path.join(WORK, "sink")
    ckpt = os.path.join(WORK, "ckpt")
    os.makedirs(in_dir)
    spark = get_spark("stream-soak", cpus=CPUS, shuffle_partitions=CPUS)

    walls = []
    for b in range(BATCHES):
        batch_docs(spark, b).coalesce(2).write.mode("append").parquet(in_dir)
        t0 = time.monotonic()
        corpus_ingest_stream(spark, in_dir, sink, ckpt)
        walls.append(round(time.monotonic() - t0, 2))
        if b % 10 == 0:
            print(f"batch {b}: {walls[-1]}s", flush=True)

    out_rows = read_corpus(spark, sink).collect()
    # ground truth: distinct content keys and their min doc_id across all
    # batches — content key (content_batch, i % (DOCS//2)) as in batch_docs
    seen: dict[tuple[int, int], int] = {}
    for b in range(BATCHES):
        for i in range(DOCS):
            doc_id = b * DOCS + i
            cb = b - 1 if (i % 4 == 0 and b > 0) else b
            key = (cb, i % (DOCS // 2))
            if key not in seen or doc_id < seen[key]:
                seen[key] = doc_id
    want_keepers = sorted(seen.values())
    got_keepers = sorted(r["doc_id"] for r in out_rows)
    assert got_keepers == want_keepers, (
        len(got_keepers), len(want_keepers),
        got_keepers[:5], want_keepers[:5],
    )
    assert all(r["n_emails"] == 1 and "<EMAIL>" in r["text"] for r in out_rows)

    dec = max(1, len(walls) // 10)
    deciles = [round(sum(walls[i:i + dec]) / len(walls[i:i + dec]), 2)
               for i in range(0, len(walls), dec)]
    print(json.dumps({
        "batches": BATCHES, "docs_per_batch": DOCS, "cpus": CPUS,
        "sink_rows": len(got_keepers), "state_hashes": len(seen),
        "wall_deciles_s": deciles,
        "wall_first5_s": walls[:5], "wall_last5_s": walls[-5:],
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
