"""Connector listing adapters (SURVEY.md §2.1 S4 Google Drive / S5 Box).

No live service exists in this sandbox, so the CONNECTOR transports stay out
of scope — but the data shapes are public API responses, and everything after
the HTTP call is an ordinary DataFrame mapping. These adapters normalize a
table of already-fetched listing rows into the engine's frontier-candidate
schema, exactly where the reference feeds its listings into the crawl queue:

- **Drive** (`DRIVE.files().list().execute().get('files')`,
  ref tests/drive_tester.py:15-17): rows shaped like the v3 ``files``
  resource — ``id, name, mimeType, parents, size``; folders are
  ``application/vnd.google-apps.folder``.
- **Box** (`client.folder(folder_id).get()` + ``item_collection['entries']``,
  ref crawlers/box.py:27-43): entries shaped ``type ('file'|'folder'), id,
  name``, with the parent folder id alongside.

Both map to ``(url, is_dir, size, parent)`` candidates: directories re-enter
the frontier (the reference pushes them back on its queue), files route to
the extraction side — the same file-vs-dir split as F1. URLs use each
service's public permalink scheme so downstream canonicalization/dedup work
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DRIVE_FOLDER_MIME = "application/vnd.google-apps.folder"

CANDIDATE_COLS = ["url", "name", "is_dir", "size", "parent_url"]


def drive_listing_to_candidates(files: DataFrame) -> DataFrame:
    """Normalize Google-Drive v3 ``files.list`` rows.

    Expects columns ``id, name, mimeType, parent_id, size`` (one row per
    file, parents flattened to the listing's folder id)."""
    return files.select(
        F.concat(F.lit("https://drive.google.com/file/d/"), F.col("id")).alias("url"),
        "name",
        (F.col("mimeType") == DRIVE_FOLDER_MIME).alias("is_dir"),
        F.coalesce(F.col("size").cast("long"), F.lit(0)).alias("size"),
        F.concat(
            F.lit("https://drive.google.com/drive/folders/"), F.col("parent_id")
        ).alias("parent_url"),
    )


def box_listing_to_candidates(entries: DataFrame) -> DataFrame:
    """Normalize Box ``folder.item_collection`` entries.

    Expects columns ``type, id, name, parent_folder_id, size``."""
    return entries.select(
        F.when(
            F.col("type") == "folder",
            F.concat(F.lit("https://app.box.com/folder/"), F.col("id")),
        )
        .otherwise(F.concat(F.lit("https://app.box.com/file/"), F.col("id")))
        .alias("url"),
        "name",
        (F.col("type") == "folder").alias("is_dir"),
        F.coalesce(F.col("size").cast("long"), F.lit(0)).alias("size"),
        F.concat(
            F.lit("https://app.box.com/folder/"), F.col("parent_folder_id")
        ).alias("parent_url"),
    )


def split_frontier_and_files(candidates: DataFrame) -> tuple[DataFrame, DataFrame]:
    """F1 route split on connector listings: directories go back to the
    frontier (the reference re-enqueues them), files go to extraction."""
    dirs = candidates.filter(F.col("is_dir")).select("url", "parent_url")
    files = candidates.filter(~F.col("is_dir")).select("url", "name", "size", "parent_url")
    return dirs, files
