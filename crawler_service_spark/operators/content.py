"""Content-based mime sniffing + archive expansion.

Re-expresses the reference's libmagic content sniff (``magic.Magic(mime=True)``
at crawlers/local_funcx.py:128,163) and its decompress-then-rescan loop
(legacy/decompressor.py:13-75, legacy/posix_crawler.py:114-147) Spark-first:

- **sniff_mime_col** — a magic-byte prefix table evaluated JVM-side: hex the
  first 8 payload bytes once, compare literal hex prefixes (whole-stage
  codegen; no UDF). A documented subset of libmagic: the container formats the
  pipeline must route (gzip/zip/7z/bz2/png/gif/jpeg/pdf) plus an HTML probe;
  everything else is application/octet-stream.
- **expand_archives** — a vectorized ``mapInPandas`` stage that opens
  gzip/zip/tar.gz payloads (stdlib codecs — these ARE in the container, unlike
  image/audio codecs) and emits one child row per member, byte-exact. Child
  rows re-enter the frontier as ``parent_url + '!/' + member_name`` candidates
  (archive_children_as_candidates), mirroring the reference's re-scan of
  extracted directories.

At 100 TB: sniffing is a map-side projection (no shuffle); expansion holds one
archive at a time per task (streamed member reads), and payloads never shuffle
— children are emitted map-side and only their (small) metadata rows continue
into the dedup/politeness shuffle.
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# (hex prefix of the first bytes, mime) — order matters: first match wins
MAGIC_MIMES: list[tuple[str, str]] = [
    ("1F8B", "application/gzip"),
    ("1F9D", "application/x-compress"),  # legacy .Z (LZW)
    ("504B0304", "application/zip"),
    ("377ABCAF271C", "application/x-7z-compressed"),
    ("FD377A585A00", "application/x-xz"),
    ("425A68", "application/x-bzip2"),
    ("89504E470D0A1A0A", "image/png"),
    ("47494638", "image/gif"),
    ("FFD8FF", "image/jpeg"),
    ("25504446", "application/pdf"),
    ("3C21444F43545950", "text/html"),  # '<!DOCTYP'
    ("3C68746D6C", "text/html"),        # '<html'
    ("3C48544D4C", "text/html"),        # '<HTML'
]

OCTET_STREAM = "application/octet-stream"


def sniff_mime_col(payload: Column | str) -> Column:
    """Mime from payload magic bytes (first 8, hexed once, prefix-compared)."""
    p = F.col(payload) if isinstance(payload, str) else payload
    hx = F.hex(F.substring(p, 1, 8))
    out = F.lit(OCTET_STREAM)
    for prefix, mime in reversed(MAGIC_MIMES):
        out = F.when(hx.startswith(prefix), F.lit(mime)).otherwise(out)
    return out


def sniff_mime_sql(payload_hex_expr: str) -> str:
    """DuckDB twin: CASE over the same prefix table, given an expression that
    yields the uppercase hex of (a prefix of) the payload."""
    whens = " ".join(
        f"WHEN {payload_hex_expr} LIKE '{prefix}%' THEN '{mime}'"
        for prefix, mime in MAGIC_MIMES
    )
    return f"CASE {whens} ELSE '{OCTET_STREAM}' END"


EXPANDED_SCHEMA = T.StructType(
    [
        T.StructField("parent_url", T.StringType()),
        T.StructField("member_idx", T.IntegerType()),
        T.StructField("member_name", T.StringType()),
        T.StructField("member_bytes", T.BinaryType()),
    ]
)


# magic prefixes the expander recognizes but CANNOT decode with stdlib codecs:
# 7z needs py7zr, .Z (LZW compress) needs the gzip CLI the reference shells out
# to (legacy/decompressor.py:13-75). These route to the dead-letter table with
# reason 'unsupported_archive' instead of silently yielding no members.
_UNSUPPORTED_PREFIXES = [b"7z\xbc\xaf\x27\x1c", b"\x1f\x9d"]


def unsupported_archive_col(payload: Column | str) -> Column:
    """JVM-side predicate: payload is an archive format the expander cannot
    decode (7z / legacy .Z). Callers dead-letter these rows."""
    p = F.col(payload) if isinstance(payload, str) else payload
    hx = F.hex(F.substring(p, 1, 6))
    return hx.startswith("377ABCAF271C") | hx.startswith("1F9D")


def _single(url: str, data: bytes, ext: str) -> list[tuple[str, bytes]]:
    """Single-stream codecs (gzip/bz2/xz on a non-tar payload) expand to one
    pseudo-member named after the url basename minus the codec extension."""
    base = url.rsplit("/", 1)[-1]
    name = base[: -len(ext)] if base.endswith(ext) else base + ".out"
    return [(name, data)]


def _members(url: str, payload: bytes) -> list[tuple[str, bytes]]:
    """Decode one archive payload into (member_name, member_bytes) pairs.
    Mirrors legacy/decompressor.py:13-75 (unzip/untar/gunzip by signature),
    plus the stdlib-codec formats bz2 and xz. Corrupt payloads and
    non-archives yield no members; formats stdlib cannot decode are
    dead-lettered upstream via ``unsupported_archive_col``."""
    import bz2
    import gzip
    import lzma
    import tarfile
    import zipfile

    def tar_or_single(mode: str, decompress, ext: str):
        # tar.<codec> expands to members; a bare stream is one pseudo-member
        try:
            with tarfile.open(fileobj=io.BytesIO(payload), mode=mode) as tf:
                return [
                    (m.name, tf.extractfile(m).read())
                    for m in tf.getmembers()
                    if m.isfile()
                ]
        except tarfile.TarError:
            return _single(url, decompress(payload), ext)

    try:
        if payload[:4] == b"PK\x03\x04":
            # (BadZipFile subclasses Exception, not OSError — caught below)
            with zipfile.ZipFile(io.BytesIO(payload)) as zf:
                return [(n, zf.read(n)) for n in zf.namelist() if not n.endswith("/")]
        if payload[:2] == b"\x1f\x8b":
            return tar_or_single("r:gz", gzip.decompress, ".gz")
        if payload[:3] == b"BZh":
            return tar_or_single("r:bz2", bz2.decompress, ".bz2")
        if payload[:6] == b"\xfd7zXZ\x00":
            return tar_or_single("r:xz", lzma.decompress, ".xz")
    except (OSError, ValueError, EOFError, zipfile.BadZipFile, tarfile.TarError):
        return []
    return []


def expand_archives(
    archives: DataFrame, url_col: str = "url", payload_col: str = "payload"
) -> DataFrame:
    """One child row per archive member (UDTF shape; vectorized per batch)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                for idx, (name, data) in enumerate(_members(url, payload or b"")):
                    rows.append((url, idx, name, data))
            yield pd.DataFrame(rows, columns=[f.name for f in EXPANDED_SCHEMA.fields])

    cols = archives.select(url_col, payload_col).withColumnsRenamed(
        {url_col: "url", payload_col: "payload"}
    )
    from ..plans.partitioning import widen

    return widen(cols).mapInPandas(run, schema=EXPANDED_SCHEMA)


def archive_dead_letters(
    archives: DataFrame, url_col: str = "url", payload_col: str = "payload"
) -> DataFrame:
    """(url, reason) rows for archive payloads the expander cannot decode
    (7z / legacy .Z — reference handles .Z by shelling out to ``gzip -dk``,
    legacy/decompressor.py:13-75, which a UDF must not do). Callers append
    these to ``fetch_failures`` with their crawl_id/iteration columns."""
    return archives.filter(unsupported_archive_col(payload_col)).select(
        F.col(url_col).alias("url"),
        F.lit("unsupported_archive").alias("reason"),
    )


def archive_children_as_candidates(expanded: DataFrame, crawl_id_col: Column | None = None) -> DataFrame:
    """Frontier-candidate rows for expanded members: url = parent!/member —
    the re-entry point that mirrors the reference's recursive re-scan of
    extracted children (legacy/posix_crawler.py:114-147). Callers push these
    through the same canonicalize -> robots -> dedup pipeline as outlinks."""
    return expanded.select(
        F.concat(F.col("parent_url"), F.lit("!/"), F.col("member_name")).alias("url"),
        F.col("parent_url"),
        F.length("member_bytes").cast("long").alias("size"),
    )
