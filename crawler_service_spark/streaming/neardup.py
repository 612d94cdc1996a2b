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

The index and the dup sink are **ManifestCatalog tables** (the same
storage layer as every other stateful structure in the engine — atomic
manifest commits, snapshot isolation, idempotent replay), not bare
``batch-*`` directories: object stores don't give directory-listing
atomicity, and the catalog's ``upto=`` snapshot reads work mid-stream.

Exactly-once: the streaming checkpoint dedupes input files; every batch's
writes are ONE idempotent catalog commit per table with
``commit_id = batch-<id>`` — a crashed/replayed batch re-reads the index
with its own commit excluded (``exclude_commit``) and its re-commits are
no-ops, so it converges to the identical index and dup set
(restart-tested). Compaction is a catalog overwrite commit, guarded
against running while the checkpoint still holds a replayable batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import docdedup
from ..storage.catalog import ManifestCatalog

DOC_SCHEMA = "doc_id long, text string"
_EMPTY_BUCKETS = "doc_id long, band int, sig string"
DUP_SCHEMA = "doc_id long, dup_of long, jaccard_permille long"

_TABLES = (("docs", DOC_SCHEMA), ("buckets", _EMPTY_BUCKETS))


def _reject_legacy_layout(root: str, subs: tuple[str, ...] = ("docs", "buckets", ".")) -> None:
    """The pre-catalog layout stored bare ``batch-*`` parquet subdirs under
    docs/ and buckets/ (and the dup sink's root). Reading such a table
    through the catalog would silently return EMPTY (no manifests), every
    pre-upgrade doc would stop deduplicating / every recorded dup would
    vanish, and nothing would error — so detect it and refuse loudly."""
    for sub in subs:
        d = os.path.normpath(os.path.join(root, sub))
        if not os.path.isdir(d) or os.path.isdir(os.path.join(d, "_manifests")):
            continue
        if any(e.startswith("batch-") for e in os.listdir(d)):
            raise RuntimeError(
                f"{d} holds a legacy batch-* near-dup index (pre-catalog "
                "layout). Re-ingest the corpus through neardup_stream into a "
                "fresh index_dir (the catalog manifests cannot be "
                "reconstructed from bare directories)."
            )


def _read_or_empty(
    cat: ManifestCatalog,
    spark: SparkSession,
    table: str,
    schema: str,
    exclude_commit: str | None = None,
) -> DataFrame:
    df = cat.read(table, exclude_commit=exclude_commit, schema=schema)
    return df if df is not None else spark.createDataFrame([], schema)


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
    _reject_legacy_layout(index_dir)
    _reject_legacy_layout(dups_dir, subs=("dups", "."))
    index_cat = ManifestCatalog(index_dir, spark)
    dups_cat = ManifestCatalog(dups_dir, spark)

    def handle_batch(batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        cid = f"batch-{batch_id}"
        index_docs = _read_or_empty(index_cat, spark, "docs", DOC_SCHEMA, cid)
        index_buckets = _read_or_empty(
            index_cat, spark, "buckets", _EMPTY_BUCKETS, cid
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
            .localCheckpoint()  # pin before the index append changes its inputs
        )
        admitted = batch.join(dups.select("doc_id"), "doc_id", "anti").localCheckpoint()
        # idempotent catalog commits: a replayed batch recomputes byte-identical
        # frames and each commit below is a no-op if it already landed
        dups_cat.commit("dups", dups, cid)
        index_cat.commit("docs", admitted, cid)
        index_cat.commit(
            "buckets",
            docdedup.minhash_buckets(admitted, num_hashes=num_hashes, bands=bands, n=n),
            cid,
        )

    q = (
        spark.readStream.schema(DOC_SCHEMA)
        .parquet(docs_dir)
        .writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _latest_log_id(d: str) -> int:
    if not os.path.isdir(d):
        return -1
    return max((int(f) for f in os.listdir(d) if f.isdigit()), default=-1)


def checkpoint_has_uncommitted_batch(checkpoint_dir: str) -> bool:
    """True when the Structured Streaming checkpoint's offsets log is ahead
    of its commits log — i.e. a batch was planned but its completion never
    recorded, so the engine WILL replay it on the next start.

    A path with no offsets log at all is NOT treated as quiesced — a typo'd
    or relocated checkpoint_dir would otherwise silently disable the guard
    this function exists to enforce."""
    offsets_dir = os.path.join(checkpoint_dir, "offsets")
    if not os.path.isdir(offsets_dir):
        raise ValueError(
            f"{checkpoint_dir} is not a streaming checkpoint (no offsets log) "
            "— pass the checkpoint_dir the stream actually ran with"
        )
    return _latest_log_id(offsets_dir) > _latest_log_id(
        os.path.join(checkpoint_dir, "commits")
    )


def compact_index(spark: SparkSession, index_dir: str, checkpoint_dir: str) -> int:
    """Fold the index's per-batch append commits into one overwrite commit
    per table (catalog ``compact`` — snapshot isolation preserved: older
    ``upto=`` reads replay the pre-compaction chain untouched). Returns the
    number of append commits folded.

    Refuses to run while ``checkpoint_dir`` holds a replayable batch: that
    batch's partial append would be folded into the overwrite, its
    ``exclude_commit`` replay protection no longer matches, and the replay
    would flag every one of its docs as a self-duplicate. This enforces the
    quiesced-stream requirement structurally instead of by docstring.
    """
    if checkpoint_has_uncommitted_batch(checkpoint_dir):
        raise RuntimeError(
            f"refusing to compact {index_dir}: checkpoint {checkpoint_dir} has a "
            "planned-but-uncommitted batch that will replay; run the stream to "
            "completion (or drop the checkpoint) first"
        )
    cat = ManifestCatalog(index_dir, spark)
    folded = 0
    for table, schema in _TABLES:
        modes = cat.commit_modes(table)
        last_ow = max(
            (i for i, (_c, m) in enumerate(modes) if m == "overwrite"), default=-1
        )
        # data dirs in the current snapshot: the last overwrite (if any) plus
        # every append after it
        active = len(modes) - last_ow if last_ow >= 0 else len(modes)
        if active <= 1:
            continue
        # deterministic commit id: a crash after data-write but before the
        # manifest rename retries under the same id; a completed compaction
        # leaves active == 1 so the next call is a no-op
        cat.compact(table, f"compact-{len(modes)}", files=1, schema=schema)
        folded += active
    return folded


def read_dups(spark: SparkSession, dups_dir: str) -> DataFrame:
    _reject_legacy_layout(dups_dir, subs=("dups", "."))
    return _read_or_empty(ManifestCatalog(dups_dir, spark), spark, "dups", DUP_SCHEMA)


def read_index_docs(
    spark: SparkSession, index_dir: str, upto: str | None = None
) -> DataFrame:
    """Current index docs; ``upto="batch-<id>"`` time-travels to the index
    exactly as of that batch's admission (works mid-stream)."""
    cat = ManifestCatalog(index_dir, spark)
    df = cat.read("docs", upto=upto, schema=DOC_SCHEMA)
    return df if df is not None else spark.createDataFrame([], DOC_SCHEMA)
