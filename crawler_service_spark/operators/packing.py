"""Sequence packing — the last mile between a cleaned corpus and a trainer.

Pre-training consumes fixed-length token sequences, not documents: documents
are laid end-to-end in a deterministic order and cut every ``seq_len``
tokens, so a 90-token doc may straddle two sequences and a 10k-token doc
spans twenty. The packing plan therefore needs every document's EXCLUSIVE
prefix sum of token counts over the global order — the one primitive that is
trivial on one machine and a classic trap on a cluster: Spark evaluates
``sum() over (ORDER BY ...)`` with no PARTITION BY in a SINGLE partition, so
the naive window is a driver-shaped bottleneck at 100 TB.

``pack_sequences`` computes the prefix sum the distributed way (the textbook
two-level scan):

1. docs are assigned to ``doc_id div bucket_size`` buckets — the global
   order (doc_id) is preserved across bucket boundaries by construction;
2. per-bucket token totals aggregate map-side into a frame of
   ``n_docs / bucket_size`` rows; the EXCLUSIVE running total over that
   small frame is the only single-partition window, and its width is chosen
   (``bucket_size``) so the frame stays thousands of rows at any corpus
   size — at 10^10 docs the default bucket_size 2^20 leaves ~10k rows;
3. bucket base offsets broadcast-join back and a per-bucket window
   (PARTITION BY bucket — parallel) adds the intra-bucket exclusive prefix.

Every downstream step is integer arithmetic on (start, n_tokens): the
sequences a doc touches are ``div(start, L) .. div(start+n-1, L)``, and the
per-sequence rollup is one shuffle on seq_id (map-side combinable). A doc
spanning many sequences explodes into exactly ``ceil span/L`` rows — total
fanout is corpus_tokens/L, linear.

Reference analogue: the reference ships extraction batches of contiguous
work items to funcX workers (crawlers/globus_base_preserved.py batching);
packing is the training-data counterpart — deterministic fixed-budget
batches over an ordered corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.partitioning import widen
from .textquality import token_count_col


def doc_offsets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_size: int = 1 << 20,
) -> DataFrame:
    """(doc_id, n_tokens, start) — ``start`` is the exclusive prefix sum of
    token counts over ascending doc_id, computed with the two-level scan
    described in the module docstring. Docs with zero tokens are dropped
    (they occupy no sequence space). ``bucket_size`` only tunes the scan
    fan-in; the output is bucket-invariant (tested)."""
    toks = (
        widen(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            token_count_col(F.col(text_col)).cast("long").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
        .withColumn("bucket", F.expr(f"div(doc_id, {int(bucket_size)})"))
    )
    # level 1: per-bucket totals (map-side combined; one small shuffle)
    totals = toks.groupBy("bucket").agg(F.sum("n_tokens").alias("bucket_tokens"))
    # level 2: exclusive running total over the SMALL bucket frame — the only
    # unpartitioned window in the plan, bounded to n_docs/bucket_size rows
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    bases = totals.select(
        "bucket",
        F.coalesce(F.sum("bucket_tokens").over(wb), F.lit(0)).alias("base"),
    )
    # level 3: intra-bucket exclusive prefix (PARTITION BY bucket — parallel)
    wi = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        toks.join(F.broadcast(bases), "bucket")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("base") + F.coalesce(F.sum("n_tokens").over(wi), F.lit(0))).alias(
                "start"
            ),
        )
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_size: int = 1 << 20,
) -> DataFrame:
    """Per-sequence packing rollup for fixed-length training sequences.

    Lays docs end-to-end in doc_id order and cuts every ``seq_len`` tokens.
    Returns one row per sequence: ``seq_id``, ``n_docs`` (docs contributing
    >=1 token), ``n_tokens`` (== seq_len except the final partial sequence),
    ``n_doc_ends`` (docs whose last token falls in this sequence — the
    attention-reset boundary count a packed-batch loader needs), and the
    contributing doc_id range. Pure integer arithmetic end-to-end, so the
    DuckDB oracle (a plain one-machine cumulative window) matches exactly —
    the two-level scan is plan shape, not semantics."""
    L = int(seq_len)
    offs = doc_offsets(docs, id_col=id_col, text_col=text_col, bucket_size=bucket_size)
    spans = offs.select(
        "doc_id",
        "n_tokens",
        "start",
        F.expr(f"div(start, {L})").alias("first_seq"),
        F.expr(f"div(start + n_tokens - 1, {L})").alias("last_seq"),
    )
    per_seq = spans.select(
        "doc_id",
        "n_tokens",
        "start",
        "last_seq",
        F.explode(F.sequence("first_seq", "last_seq")).alias("seq_id"),
    )
    tok_here = F.least(
        (F.col("seq_id") + 1) * L, F.col("start") + F.col("n_tokens")
    ) - F.greatest(F.col("seq_id") * L, F.col("start"))
    return (
        per_seq.groupBy("seq_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(tok_here).cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("seq_id") == F.col("last_seq"), 1).otherwise(0))
            .cast("long")
            .alias("n_doc_ends"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
    )
