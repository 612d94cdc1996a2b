"""Regression pins for the round-5 dirty-input and scoring-consistency fixes.

Covers: NULL/ragged/NaN-element vector rows skipped (not task-killing, not
garbage-coded) in lsh_band_buckets / with_lsh_bucket / pq_encode_udf;
banding-config guards that used to silently drop trailing hashes/planes;
consistent-set Jaccard sizing under a binding hot-shingle cut; and the
bloom probe positions escaping the bucket-pinned low bits of h1.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_service_spark.operators import docdedup, similarity
from crawler_service_spark.operators.dedup import _positions


def _quant_df(spark, rows, dim=8):
    return spark.createDataFrame(rows, "vec_id long, qv array<long>").repartition(2)


PLANES = [[((i * 7 + j * 13) % 19) - 9 for j in range(8)] for i in range(4)]


def test_lsh_band_buckets_skips_dirty_rows(spark):
    clean = [(0, [1000, -200, 3, 40, -5, 60, 7, -80]),
             (1, [-100, 250, -3, 4, 500, -6, 70, 8])]
    dirty = [(2, None),                                  # NULL vector
             (3, [1, 2, 3]),                             # wrong length
             (4, [1, 2, None, 4, 5, 6, 7, 8])]           # NULL element -> NaN
    got = similarity.lsh_band_buckets(
        _quant_df(spark, clean + dirty), PLANES, band_bits=2
    )
    ref = similarity.lsh_band_buckets(_quant_df(spark, clean), PLANES, band_bits=2)
    assert {r["id"] for r in got.collect()} == {0, 1}
    key = lambda df: sorted((r["id"], r["band"], r["key"]) for r in df.collect())
    assert key(got) == key(ref)


def test_lsh_band_buckets_rejects_unbanded_planes(spark):
    df = _quant_df(spark, [(0, [1, 2, 3, 4, 5, 6, 7, 8])])
    with pytest.raises(ValueError, match="multiple of band_bits"):
        similarity.lsh_band_buckets(df, PLANES[:3], band_bits=2)


def test_with_lsh_bucket_drops_dirty_rows(spark):
    clean = [(0, [0.5, -1.2, 3.0, 0.1]), (1, [-2.0, 0.3, 0.7, -0.9])]
    dirty = [(2, None), (3, [1.0, 2.0]), (4, [1.0, float("nan"), 3.0, 4.0])]
    mk = lambda rows: spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(2)
    got = similarity.with_lsh_bucket(mk(clean + dirty), dim=4, n_planes=6)
    ref = similarity.with_lsh_bucket(mk(clean), dim=4, n_planes=6)
    key = lambda df: sorted((r["vec_id"], r["bucket"]) for r in df.collect())
    assert {r["vec_id"] for r in got.collect()} == {0, 1}
    assert key(got) == key(ref)


def test_pq_encode_udf_null_element_yields_null_codes(spark):
    # 16 clean vectors seed the codebook; the dirty rows must encode to NULL
    # codes — NOT to INT64_MIN-garbage from a silent NaN cast (the fixed bug).
    rng = np.random.default_rng(3)
    clean = [(i, [int(v) for v in rng.integers(-999, 999, 8)]) for i in range(16)]
    dirty = [(16, [1, 2, 3, None, 5, 6, 7, 8]), (17, None), (18, [1, 2])]
    df = _quant_df(spark, clean + dirty)
    cb = similarity.pq_codebook(df.filter(F.col("vec_id") < 16),
                                n_subspaces=4, n_codes=16)
    enc = df.select("vec_id", similarity.pq_encode_udf(cb)(F.col("qv")).alias("codes"))
    rows = {r["vec_id"]: r["codes"] for r in enc.collect()}
    assert rows[16] is None and rows[17] is None and rows[18] is None
    # clean rows match the JVM expression twin exactly (ties-to-smaller-k)
    jvm = df.filter(F.col("vec_id") < 16).select(
        "vec_id", F.array(*[c for c in similarity.pq_encode_cols(cb)]).alias("codes")
    )
    assert {r["vec_id"]: list(r["codes"]) for r in jvm.collect()} == {
        i: list(rows[i]) for i in range(16)
    }


def test_minhash_buckets_rejects_unbanded_hashes(spark):
    docs = spark.createDataFrame(
        [(0, "a b c d e f")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="multiple of bands"):
        docdedup.minhash_buckets(docs, num_hashes=10, bands=4)


def test_ngram_jaccard_consistent_sizing_under_hot_shingle_cut(spark):
    """Two byte-identical docs must score jaccard 1000 even when a shared
    boilerplate shingle is removed by the hot-shingle cut. Sizing from the
    UNFILTERED sets (the old behavior) would leave |A|+|B| larger than the
    filtered intersection can reach and silently drop the pair."""
    boiler = "all rights reserved worldwide"
    body = "quick brown foxes jump over lazy dogs"
    docs = spark.createDataFrame(
        [(i, f"{body} {boiler}") for i in (0, 1)]
        + [(i, f"totally unrelated text number {i} {boiler}") for i in range(2, 8)],
        "doc_id long, text string",
    )
    # boiler's shingles appear in all 8 docs -> df=8 > max_shingle_freq=4
    pairs = docdedup.ngram_jaccard_pairs(
        docs, n=3, threshold_permille=1000, max_shingle_freq=4
    ).collect()
    assert {(r["doc_a"], r["doc_b"], r["jaccard_permille"]) for r in pairs} == {
        (0, 1, 1000)
    }


def test_bloom_positions_escape_the_bucket_pin():
    """h1 pinned to one bucket residue (low 6 bits constant) must still
    produce probe positions spread across the whole bit array: every probe
    column covers many residues mod 64, and no column is constant (the
    original scheme's i=0 column was)."""
    rng = np.random.default_rng(5)
    n, k, m = 4000, 7, 1 << 17
    h1 = (rng.integers(0, 2**62, n) // 64 * 64 + 9).astype(np.int64)
    h2 = rng.integers(0, 2**62, n).astype(np.int64)
    pos = _positions(h1, h2, k, m)
    assert pos.shape == (n, k)
    assert ((0 <= pos) & (pos < m)).all()
    for col in range(k):
        residues = np.unique(pos[:, col] % 64)
        assert len(residues) == 64, f"probe {col} pinned to {len(residues)} residues"
    # distinct positions per row (odd stride, k small vs m)
    assert all(len(set(row)) == k for row in pos[:50])
