"""Rolling near-dup dedup: each micro-batch deduped against a PERSISTED
minhash index — the streaming form of ``docdedup.minhash_incremental_dups``
(the shape a nightly 100 TB ingest runs: dedupe tonight's crawl against the
standing corpus without recomparing the corpus to itself; SURVEY.md §2.10).

Per micro-batch, inside ``foreachBatch``:

1. join the batch's fresh minhash band-buckets against the persisted bucket
   index (equi-join on (band, sig) — touches only matching index buckets);
2. Jaccard-verify candidates, shingling ONLY the candidate index docs
   (semi-join pushdown, never the whole corpus);
3. flag intra-batch near-dups too (first-occurrence by doc_id, verified
   pairs within the batch) so a batch carrying both copies of a page never
   seeds the index with a near-dup pair;
4. write flagged dups to the dup sink; append the batch's NON-dup docs and
   their buckets to the index.

Exactly-once: the streaming checkpoint dedupes input files, and every write
lands in a ``batch-<id>`` subdir overwritten on replay (same idempotency
scheme as streaming/ingest.py) — a crashed/replayed batch converges to the
identical index and dup set (restart-tested).

State growth is the index itself (parquet, partition-pruned by the bucket
join), not executor memory — unlike the exact-dedup state store, the
near-dup index is shared, queryable, and compactable offline.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import docdedup

DOC_SCHEMA = "doc_id long, text string"
_EMPTY_BUCKETS = "doc_id long, band int, sig string"
DUP_SCHEMA = "doc_id long, dup_of long, jaccard_permille long"


def _read_batches(
    spark: SparkSession, base: str, schema: str, exclude_id: int | None = None
) -> DataFrame:
    """Union of ``batch-*`` subdirs, EXCLUDING the current batch's own subdir:
    a crashed-then-replayed batch must not see its previous partial append in
    the index, or every doc would flag as a dup of itself."""
    parts = sorted(
        os.path.join(base, d)
        for d in (os.listdir(base) if os.path.isdir(base) else [])
        if d.startswith("batch-") and d != f"batch-{exclude_id}"
    )
    if not parts:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*parts)


def neardup_stream(
    spark: SparkSession,
    docs_dir: str,
    index_dir: str,
    dups_dir: str,
    checkpoint_dir: str,
    threshold_permille: int = 300,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
) -> None:
    """Drain available doc files through the rolling index-dedup gate."""
    docs_idx = os.path.join(index_dir, "docs")
    buckets_idx = os.path.join(index_dir, "buckets")
    for d in (docs_idx, buckets_idx, dups_dir):
        os.makedirs(d, exist_ok=True)

    def handle_batch(batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        index_docs = _read_batches(spark, docs_idx, DOC_SCHEMA, exclude_id=batch_id)
        index_buckets = _read_batches(
            spark, buckets_idx, _EMPTY_BUCKETS, exclude_id=batch_id
        )
        vs_index = docdedup.minhash_incremental_dups(
            batch, index_docs,
            num_hashes=num_hashes, bands=bands, n=n,
            threshold_permille=threshold_permille,
            index_buckets=index_buckets,
        )
        # intra-batch near-dups (a nightly ingest routinely contains them):
        # first-occurrence rule — a doc duplicating a SMALLER-id batch doc is
        # flagged too, so the standing index never admits a near-dup pair.
        # dup_of may itself be a flagged doc in an a<b<c chain (documented
        # union-find simplification; the canonical keeper lives in
        # docdedup.minhash_dup_clusters for offline resolution).
        pairs = docdedup.minhash_verified_pairs(
            batch, num_hashes=num_hashes, bands=bands, n=n,
            threshold_permille=threshold_permille,
        )
        wb = Window.partitionBy("doc_b").orderBy(
            F.desc("jaccard_permille"), F.asc("doc_a")
        )
        intra = (
            pairs.withColumn("__rn", F.row_number().over(wb))
            .filter(F.col("__rn") == 1)
            .select(
                F.col("doc_b").alias("doc_id"),
                F.col("doc_a").alias("dup_of"),
                "jaccard_permille",
            )
        )
        wd = Window.partitionBy("doc_id").orderBy(
            F.desc("jaccard_permille"), F.asc("dup_of")
        )
        dups = (
            vs_index.unionByName(intra)
            .withColumn("__rn", F.row_number().over(wd))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .localCheckpoint()  # pin before the index append mutates its input dirs
        )
        admitted = batch.join(dups.select("doc_id"), "doc_id", "anti").localCheckpoint()
        dups.write.mode("overwrite").parquet(os.path.join(dups_dir, f"batch-{batch_id}"))
        admitted.write.mode("overwrite").parquet(os.path.join(docs_idx, f"batch-{batch_id}"))
        docdedup.minhash_buckets(
            admitted, num_hashes=num_hashes, bands=bands, n=n
        ).write.mode("overwrite").parquet(os.path.join(buckets_idx, f"batch-{batch_id}"))

    q = (
        spark.readStream.schema(DOC_SCHEMA)
        .parquet(docs_dir)
        .writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def compact_index(spark: SparkSession, index_dir: str) -> int:
    """Fold all ``batch-*`` index deltas into one base dir (offline, stream
    quiesced). Returns the number of delta dirs folded.

    Run ONLY between stream runs: replay protection excludes a batch's OWN
    subdir by id, so compacting while a batch might still replay would fold
    its partial append into the base and make the replay self-dup.

    Crash safety without a manifest: the complete fold is row-deduplicated
    and renamed to a ``batch-``-prefixed name BEFORE the old deltas are
    removed. A crash mid-removal leaves the fold plus some deltas — duplicate
    rows, which change no dedup decision (same buckets, same doc ids) and
    which the next compact_index folds away. The index is never partial.
    """
    import shutil
    import uuid

    folded = 0
    for sub, schema, keys in (
        ("docs", DOC_SCHEMA, ["doc_id"]),
        ("buckets", _EMPTY_BUCKETS, ["doc_id", "band", "sig"]),
    ):
        base = os.path.join(index_dir, sub)
        parts = sorted(
            d for d in (os.listdir(base) if os.path.isdir(base) else [])
            if d.startswith("batch-")
        )
        if len(parts) <= 1:
            continue
        tmp = os.path.join(base, f".compact-{uuid.uuid4().hex[:8]}")
        _read_batches(spark, base, schema).dropDuplicates(keys).write.mode(
            "overwrite"
        ).parquet(tmp)
        os.rename(tmp, os.path.join(base, f"batch-0-compact-{uuid.uuid4().hex[:8]}"))
        for d in parts:
            shutil.rmtree(os.path.join(base, d))
        folded += len(parts)
    return folded


def read_dups(spark: SparkSession, dups_dir: str) -> DataFrame:
    return _read_batches(spark, dups_dir, DUP_SCHEMA)


def read_index_docs(spark: SparkSession, index_dir: str) -> DataFrame:
    return _read_batches(spark, os.path.join(index_dir, "docs"), DOC_SCHEMA)
