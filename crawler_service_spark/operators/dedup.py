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
  (unlike ``df.stat.bloomFilter`` which collects to one driver-side filter);
- a **partitioned cuckoo filter** (``CuckooSeenFilter``) as the deletable
  alternative — same storage/probing pattern, 4-way partial-key buckets,
  and ``remove()`` for re-crawl/TTL expiry of seen URLs, which Bloom cannot
  express. Both plug into ``dedup_new_urls`` interchangeably.

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


def _ck_fp_i1_i2(h1: np.ndarray, h2: np.ndarray, B: int):
    Bu = np.uint64(B)
    fp = (h2.astype(np.uint64) % np.uint64(65535) + np.uint64(1)).astype(np.uint16)
    i1 = (h1.astype(np.uint64) % Bu).astype(np.int64)
    i2 = (
        (i1.astype(np.uint64) ^ (fp.astype(np.uint64) * np.uint64(0x5BD1E995))) % Bu
    ).astype(np.int64)
    return fp, i1, i2


def _ck_decode(blob: bytes | None, B: int):
    if blob is None:
        return np.zeros((B, 4), dtype=np.uint16), False
    arr = np.frombuffer(blob[:-1], dtype=np.uint16).reshape(B, 4).copy()
    return arr, blob[-1] != 0


def _ck_encode(slots: np.ndarray, overflow: bool) -> bytes:
    return slots.tobytes() + (b"\x01" if overflow else b"\x00")


def _ck_bulk_place(slots: np.ndarray, fp, idx) -> np.ndarray:
    """Vectorized first-fit of (fp, bucket-idx) pairs; returns the mask of
    items that did NOT fit (residue for the eviction walk)."""
    order = np.argsort(idx, kind="stable")
    fp_s, idx_s = fp[order], idx[order]
    # rank of each item within its bucket
    _, starts = np.unique(idx_s, return_index=True)
    rank = np.arange(len(idx_s)) - np.repeat(starts, np.diff(np.append(starts, len(idx_s))))
    empty_first = np.argsort(slots[idx_s] != 0, axis=1, kind="stable")
    n_empty = (slots[idx_s] == 0).sum(axis=1)
    can = rank < n_empty
    slot_pos = empty_first[np.arange(len(idx_s)), np.minimum(rank, 3)]
    slots[idx_s[can], slot_pos[can]] = fp_s[can]
    unplaced = np.zeros(len(fp), dtype=bool)
    unplaced[order[~can]] = True
    return unplaced


def _ck_insert_all(slots: np.ndarray, fp, i1, i2, B: int, kicks: int = 500) -> bool:
    """Insert every (fp, i1, i2); returns overflow=True if any item could not
    be placed within the kick budget."""
    rng = np.random.default_rng(12345)  # deterministic walk
    res1 = _ck_bulk_place(slots, fp, i1)
    if not res1.any():
        return False
    res2 = _ck_bulk_place(slots, fp[res1], i2[res1])
    overflow = False
    for f, a, _b in zip(fp[res1][res2], i1[res1][res2], i2[res1][res2]):
        cur_fp, cur_b = int(f), int(a)
        placed = False
        for _ in range(kicks):
            empties = np.flatnonzero(slots[cur_b] == 0)
            if len(empties):
                slots[cur_b, empties[0]] = cur_fp
                placed = True
                break
            sslot = int(rng.integers(0, 4))
            cur_fp, slots[cur_b, sslot] = int(slots[cur_b, sslot]), cur_fp
            cur_b = int(
                (np.uint64(cur_b) ^ (np.uint64(cur_fp) * np.uint64(0x5BD1E995)))
                % np.uint64(B)
            )
        if not placed:
            overflow = True
    return overflow


class CuckooSeenFilter:
    """Partitioned cuckoo filter over the URL-seen set — the deletable
    alternative to BloomSeenFilter (north-star: "Bloom/cuckoo-filter URL-seen
    set"). Same storage pattern: one blob per ``pmod(h1, n_buckets)``
    partition, committed through the catalog, cogrouped Arrow UDFs for
    build/probe — plus ``remove()``, which Bloom cannot do (re-crawl/TTL
    expiry of seen URLs).

    Layout per blob: uint16 array of shape (n_slots/4, 4) — 4-way buckets of
    16-bit fingerprints (0 = empty) + a 1-byte overflow flag. Partial-key
    cuckoo: fp = h2-derived nonzero 16-bit; i1 = h1 mod B;
    i2 = i1 XOR (fp * 0x5bd1e995) mod B. Inserts are two vectorized
    first-fit passes (numpy per-bucket slot assignment) with a bounded
    eviction walk only for the residue; if a walk exhausts, the overflow
    flag degrades that PARTITION to all-maybe — the safe direction (extra
    exact lookups, never a lost URL).
    """

    TABLE = "seen_cuckoo"
    _KICKS = 500

    def __init__(
        self,
        catalog: ManifestCatalog,
        n_buckets: int = 64,
        n_slots: int = 1 << 14,   # slots per partition blob (multiple of 4)
    ):
        assert n_slots % 4 == 0
        self.catalog = catalog
        self.n_buckets = n_buckets
        self.n_slots = n_slots
        self.B = n_slots // 4
        # The alternate-bucket map i2 = (i1 ^ fp*C) mod B is an involution of
        # the (i1, i2) pair ONLY when B is a power of two (mod = low-bit mask,
        # and i1 < B has only low bits). With any other B a kicked fingerprint
        # can land in a bucket the 2-way probe never checks — a FALSE NEGATIVE,
        # which breaks the filter's "false positives only" safety contract.
        if self.B & (self.B - 1):
            raise ValueError(
                f"cuckoo bucket count must be a power of two, got n_slots={n_slots} "
                f"(B={self.B}); round n_slots to 4*2^k"
            )

    # ------------------------------------------------------------------ build
    def update(self, new_urls: DataFrame, commit_id: str, upto: str | None = None) -> None:
        existing = self.catalog.read(self.TABLE, upto=upto)
        if existing is None:
            existing = new_urls.sparkSession.createDataFrame([], "bucket int, bits binary")
        hashed = with_bloom_hashes(new_urls, n_buckets=self.n_buckets).select(
            "__h1", "__h2", "__bucket"
        )

        B, kicks = self.B, self._KICKS

        def merge(key, urls_pdf: pd.DataFrame, blob_pdf: pd.DataFrame):
            slots, overflow = _ck_decode(
                bytes(blob_pdf["bits"].iloc[0]) if len(blob_pdf) else None, B
            )
            if len(urls_pdf):
                fp, i1, i2 = _ck_fp_i1_i2(
                    urls_pdf["__h1"].to_numpy(), urls_pdf["__h2"].to_numpy(), B
                )
                overflow = _ck_insert_all(slots, fp, i1, i2, B, kicks) or overflow
            return pd.DataFrame(
                {"bucket": [int(key[0])], "bits": [_ck_encode(slots, overflow)]}
            )

        merged = (
            hashed.groupBy("__bucket")
            .cogroup(existing.groupBy("bucket"))
            .applyInPandas(merge, schema="bucket int, bits binary")
        )
        self.catalog.commit(self.TABLE, merged, commit_id, mode="overwrite")

    # ----------------------------------------------------------------- delete
    def remove(self, urls: DataFrame, commit_id: str, upto: str | None = None) -> None:
        """Delete one fingerprint occurrence per url — the operation Bloom
        cannot support (re-crawl / TTL expiry).

        Standard cuckoo contract: only delete urls that WERE inserted.
        Fingerprints are multiset copies, so colliding items stay findable as
        long as inserts and deletes pair up; deleting a never-inserted url is
        undefined (it may consume a colliding item's copy)."""
        existing = self.catalog.read(self.TABLE, upto=upto)
        if existing is None:
            return
        hashed = with_bloom_hashes(urls, n_buckets=self.n_buckets).select(
            "__h1", "__h2", "__bucket"
        )

        B = self.B

        def drop(key, urls_pdf: pd.DataFrame, blob_pdf: pd.DataFrame):
            if not len(blob_pdf):
                return pd.DataFrame({"bucket": [], "bits": []}).astype(
                    {"bucket": "int32", "bits": object}
                )
            slots, overflow = _ck_decode(bytes(blob_pdf["bits"].iloc[0]), B)
            if len(urls_pdf):
                fp, i1, i2 = _ck_fp_i1_i2(
                    urls_pdf["__h1"].to_numpy(), urls_pdf["__h2"].to_numpy(), B
                )
                for f, a, b in zip(fp, i1, i2):
                    for bucket in (int(a), int(b)):
                        hit = np.flatnonzero(slots[bucket] == f)
                        if len(hit):
                            slots[bucket, hit[0]] = 0
                            break
            return pd.DataFrame(
                {"bucket": [int(key[0])], "bits": [_ck_encode(slots, overflow)]}
            )

        merged = (
            hashed.groupBy("__bucket")
            .cogroup(existing.groupBy("bucket"))
            .applyInPandas(drop, schema="bucket int, bits binary")
        )
        self.catalog.commit(self.TABLE, merged, commit_id, mode="overwrite")

    # ------------------------------------------------------------------ probe
    def flag_maybe_seen(self, candidates: DataFrame, upto: str | None = None) -> DataFrame:
        blobs = self.catalog.read(self.TABLE, upto=upto)
        if blobs is None:
            return candidates.withColumn("maybe_seen", F.lit(False))
        from pyspark.sql import types as T

        hashed = with_bloom_hashes(candidates, n_buckets=self.n_buckets)
        out_schema = T.StructType(
            [f for f in hashed.schema.fields if f.name != "__bucket"]
            + [T.StructField("maybe_seen", T.BooleanType(), False)]
        )

        B = self.B

        def probe(key, cand_pdf: pd.DataFrame, blob_pdf: pd.DataFrame):
            if not len(cand_pdf):
                return cand_pdf.drop(columns=["__bucket"]).assign(maybe_seen=True)
            out = cand_pdf.drop(columns=["__bucket"])
            if not len(blob_pdf):
                out["maybe_seen"] = False
                return out
            slots, overflow = _ck_decode(bytes(blob_pdf["bits"].iloc[0]), B)
            if overflow:
                out["maybe_seen"] = True  # degraded partition: safe direction
                return out
            fp, i1, i2 = _ck_fp_i1_i2(
                cand_pdf["__h1"].to_numpy(), cand_pdf["__h2"].to_numpy(), B
            )
            hit = (slots[i1] == fp[:, None]).any(axis=1) | (
                slots[i2] == fp[:, None]
            ).any(axis=1)
            out["maybe_seen"] = hit
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
