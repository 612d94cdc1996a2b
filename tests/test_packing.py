"""Sequence-packing semantics: the two-level prefix scan must be exactly the
one-machine cumulative sum, at any bucket size and any input partitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_service_spark.operators import packing


def _docs(spark, counts):
    """docs frame where doc i has counts[i] single-char tokens."""
    rows = [(i, " ".join("x" for _ in range(c))) for i, c in enumerate(counts)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_offsets_match_python_cumsum(spark):
    counts = [5, 0, 12, 3, 40, 1, 7, 0, 2, 9, 31, 4]
    docs = _docs(spark, counts)
    got = {
        r["doc_id"]: (r["n_tokens"], r["start"])
        for r in packing.doc_offsets(docs, bucket_size=3).collect()
    }
    acc = 0
    for i, c in enumerate(counts):
        if c == 0:
            assert i not in got, "zero-token docs occupy no sequence space"
            continue
        assert got[i] == (c, acc), f"doc {i}"
        acc += c


def test_bucket_size_and_partitioning_invariance(spark):
    counts = [(i * 37) % 23 for i in range(200)]
    docs = _docs(spark, counts)
    base = _rows(packing.pack_sequences(docs, seq_len=64, bucket_size=64))
    assert base == _rows(
        packing.pack_sequences(docs.repartition(13), seq_len=64, bucket_size=7)
    )
    assert base == _rows(
        packing.pack_sequences(docs.repartition(1), seq_len=64, bucket_size=1000)
    )


def test_rollup_conservation_and_boundaries(spark):
    counts = [(i * 13) % 50 for i in range(150)]
    docs = _docs(spark, counts)
    L = 128
    out = packing.pack_sequences(docs, seq_len=L).collect()
    total = sum(c for c in counts if c > 0)
    n_docs_nonzero = sum(1 for c in counts if c > 0)
    by_seq = {r["seq_id"]: r for r in out}
    assert set(by_seq) == set(range((total + L - 1) // L)), "contiguous seq ids"
    assert sum(r["n_tokens"] for r in out) == total, "every token lands once"
    assert sum(r["n_doc_ends"] for r in out) == n_docs_nonzero, "every doc ends once"
    last = max(by_seq)
    for s, r in by_seq.items():
        assert r["n_tokens"] == (L if s < last else total - L * last)
        assert r["first_doc_id"] <= r["last_doc_id"]


def test_doc_spanning_many_sequences(spark):
    docs = _docs(spark, [3, 1000, 2])
    out = {r["seq_id"]: r for r in packing.pack_sequences(docs, seq_len=64).collect()}
    # doc 1 spans seqs 0..15 (tokens 3..1002); only seq 0 and 15 share docs
    assert out[0]["n_docs"] == 2 and out[0]["n_doc_ends"] == 1
    for s in range(1, 15):
        assert out[s]["n_docs"] == 1 and out[s]["n_doc_ends"] == 0
    assert out[15]["n_doc_ends"] >= 1
    assert out[15]["last_doc_id"] == 2
