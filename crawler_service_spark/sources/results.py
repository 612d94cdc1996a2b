"""Result-queue consumption (SURVEY.md §2.1 S6): the pluck-n cursor API.

The reference serves extraction results in batches of n with an advancing
queue cursor and an emptiness flag (``fetch_crawl_mdata``,
application.py:248-274: receive up to n SQS messages, delete them, report
``queue_empty``). The Spark-native equivalent is a snapshot read of
``extraction_jobs`` ordered by the monotone ``family_seq`` with an explicit
client-held cursor — consumption is non-destructive (the queue is a table;
"delete" is just advancing the cursor), so replays are free and multiple
consumers can hold independent cursors.

Plan shape: crawl_id + family_seq predicates push into the parquet scan and
the order-by-limit compiles to TakeOrderedAndProject — per-pluck cost is
O(scan of matching row groups), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..storage import ManifestCatalog


def fetch_extraction_jobs(
    catalog: ManifestCatalog,
    crawl_id: str,
    after_family_seq: int = -1,
    n: int = 10,
) -> tuple[list[dict], int, bool]:
    """Pluck up to ``n`` extraction jobs after the cursor.

    Returns ``(rows, next_cursor, queue_empty)`` — the reference's
    (response list, implicit receipt-handle advance, 'queue_empty') triple.
    ``queue_empty`` is True when the snapshot holds nothing past the cursor.
    """
    df = catalog.read("extraction_jobs")
    if df is None:
        return [], after_family_seq, True
    batch = (
        df.filter(
            (F.col("crawl_id") == crawl_id)
            & (F.col("family_seq") > after_family_seq)
        )
        .orderBy(F.col("family_seq").asc())
        .limit(n + 1)  # +1 probe: is anything left after this batch?
        .collect()
    )
    rows = [r.asDict() for r in batch[:n]]
    next_cursor = int(rows[-1]["family_seq"]) if rows else after_family_seq
    queue_empty = len(batch) <= n
    return rows, next_cursor, queue_empty
