"""URL-seen set: partitioned Bloom accelerator + exact anti-join backstop.

The reference deduplicates with in-memory Python sets (per-family
``tracked_files``, crawlers/globus_base_preserved.py:396-403; a stub global
``dup_check``, legacy/posix_crawler.py:67-68). At 10^10 URLs the seen set
cannot live in one memory image, so:

- the **exact** membership structure is the ``seen`` table, hash-partitioned by
  ``url_hash = xxhash64(canonical_url)``; dedup is a left-anti join on
  ``(url_hash, url)`` — the full url string is part of the join key because
  xxhash64 *will* collide a handful of times at 10^10 keys, and a collision
  must never drop an unseen URL;
- a **partitioned Bloom filter** (``seen_filters(bucket, bits)``; one blob per
  ``pmod(url_hash, n_buckets)`` bucket) accelerates the common case. Direction
  of approximation is the safe one: bloom says "definitely new" (skip the
  exact join entirely) or "maybe seen" (fall through to the exact anti-join).
  False positives only cost extra exact lookups; they can never lose URLs.
  Sizing at 10^10 keys / 1% fpp ≈ 12 GB of bits — which is exactly why the
  filter is bucketed and lives distributed in a table, never on the driver
  (unlike ``df.stat.bloomFilter`` which collects to one driver-side filter).

All bloom hash material is computed JVM-side (two independent xxhash64 streams);
Python only touches int64 numpy arrays inside Arrow-batched grouped UDFs
(Kirsch-Mitzenmacher double hashing: pos_i = h1 + i*h2 mod m).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import ManifestCatalog

_H2_SALT = 0x9E3779B9  # second, independent hash stream: xxhash64(url, salt)


def _positions(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    """(n, k) bit positions via double hashing; uint64 wraparound is fine."""
    a = h1.astype(np.uint64)
    b = h2.astype(np.uint64)
    ks = np.arange(k, dtype=np.uint64)[None, :]
    return ((a[:, None] + ks * b[:, None]) % np.uint64(m)).astype(np.int64)


def with_bloom_hashes(df: DataFrame, url_col: str = "url", n_buckets: int = 64) -> DataFrame:
    return (
        df.withColumn("__h1", F.xxhash64(F.col(url_col)))
        .withColumn("__h2", F.xxhash64(F.col(url_col), F.lit(_H2_SALT)))
        .withColumn("__bucket", F.pmod(F.col("__h1"), F.lit(n_buckets)).cast("int"))
    )


class BloomSeenFilter:
    """Partitioned bloom over the URL-seen set, persisted in the catalog."""

    TABLE = "seen_filters"

    def __init__(
        self,
        catalog: ManifestCatalog,
        n_buckets: int = 64,
        m_bits: int = 1 << 17,
        k_hashes: int = 7,
    ):
        self.catalog = catalog
        self.n_buckets = n_buckets
        self.m_bits = m_bits
        self.k = k_hashes

    # ------------------------------------------------------------------ build
    def update(self, new_urls: DataFrame, commit_id: str, upto: str | None = None) -> None:
        """OR the new urls' bits into each bucket's blob (grouped Arrow UDF per
        bucket; cogrouped with the existing blobs so each bucket is touched
        exactly once)."""
        m, k = self.m_bits, self.k
        nb = self.n_buckets
        hashed = with_bloom_hashes(new_urls, n_buckets=nb).select("__h1", "__h2", "__bucket")
        existing = self.catalog.read(self.TABLE, upto=upto)
        if existing is None:
            existing = new_urls.sparkSession.createDataFrame([], "bucket int, bits binary")

        def merge(key, urls_pdf: pd.DataFrame, blob_pdf: pd.DataFrame):
            bits = (
                np.frombuffer(blob_pdf["bits"].iloc[0], dtype=np.uint8).copy()
                if len(blob_pdf)
                else np.zeros(m // 8, dtype=np.uint8)
            )
            if len(urls_pdf):
                pos = _positions(
                    urls_pdf["__h1"].to_numpy(), urls_pdf["__h2"].to_numpy(), k, m
                ).ravel()
                np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
            return pd.DataFrame({"bucket": [int(key[0])], "bits": [bits.tobytes()]})

        merged = (
            hashed.groupBy("__bucket")
            .cogroup(existing.groupBy("bucket"))
            .applyInPandas(merge, schema="bucket int, bits binary")
        )
        self.catalog.commit(self.TABLE, merged, commit_id, mode="overwrite")

    # ------------------------------------------------------------------ probe
    def flag_maybe_seen(self, candidates: DataFrame, upto: str | None = None) -> DataFrame:
        """Add boolean ``maybe_seen``: False = definitely never seen (bloom
        miss), True = needs the exact anti-join. Cogrouped by bucket so the
        blob is deserialized once per bucket, not once per row."""
        blobs = self.catalog.read(self.TABLE, upto=upto)
        if blobs is None:
            return candidates.withColumn("maybe_seen", F.lit(False))
        from pyspark.sql import types as T

        m, k = self.m_bits, self.k
        hashed = with_bloom_hashes(candidates, n_buckets=self.n_buckets)
        # fresh StructType — StructType.add() mutates the cached schema in place
        out_schema = T.StructType(
            [f for f in hashed.schema.fields if f.name != "__bucket"]
            + [T.StructField("maybe_seen", T.BooleanType(), False)]
        )

        def probe(key, cand_pdf: pd.DataFrame, blob_pdf: pd.DataFrame):
            if not len(cand_pdf):
                return cand_pdf.drop(columns=["__bucket"]).assign(maybe_seen=True)
            out = cand_pdf.drop(columns=["__bucket"])
            if not len(blob_pdf):
                out["maybe_seen"] = False
                return out
            bits = np.frombuffer(blob_pdf["bits"].iloc[0], dtype=np.uint8)
            pos = _positions(cand_pdf["__h1"].to_numpy(), cand_pdf["__h2"].to_numpy(), k, m)
            hit = (bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
            out["maybe_seen"] = hit.all(axis=1)
            return out

        flagged = (
            hashed.groupBy("__bucket")
            .cogroup(blobs.groupBy("bucket"))
            .applyInPandas(probe, schema=out_schema)
        )
        return flagged.drop("__h1", "__h2")


def anti_join_seen(candidates: DataFrame, seen: DataFrame | None) -> DataFrame:
    """Exact dedup: drop candidates whose (url_hash, url) is in the seen set.

    Joining on the hash first lets Spark shuffle both sides on a uniform int64
    key (no host skew); the url equality rides along for collision safety.
    """
    if seen is None:
        return candidates
    return candidates.join(
        seen.select("url_hash", "url"), on=["url_hash", "url"], how="left_anti"
    )


def dedup_new_urls(
    candidates: DataFrame,
    seen: DataFrame | None,
    bloom: BloomSeenFilter | None,
    bloom_upto: str | None = None,
) -> DataFrame:
    """Bloom fast-path + exact anti-join backstop (see module docstring)."""
    if bloom is None or seen is None:
        return anti_join_seen(candidates, seen)
    flagged = bloom.flag_maybe_seen(candidates, upto=bloom_upto)
    definite_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    return definite_new.unionByName(anti_join_seen(maybe, seen))
