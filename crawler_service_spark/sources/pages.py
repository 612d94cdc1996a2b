"""Pages-table source (SURVEY.md §2.1 S2/S3): the Common-Crawl-style store
``pages(url, warc_ts, html, text, lang)`` read as a columnar scan.

The reference lists directories imperatively (``operation_ls``/``os.walk``,
crawlers/globus_base_preserved.py:277, legacy/posix_crawler.py:204); here the
"listing" is a parquet/Iceberg scan and the engine relies on Catalyst for
column pruning and predicate pushdown — ``scan_report`` makes that checkable
instead of assumed (§4.2 "free from Catalyst — verify via explain()").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGE_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    lang: str | None = None,
) -> DataFrame:
    """Scan the pages table with explicit projection (column pruning) and an
    optional language predicate (pushed to the parquet reader)."""
    df = spark.read.parquet(path)
    if lang is not None:
        df = df.filter(F.col("lang") == lang)
    if columns:
        df = df.select(*columns)
    return df


def scan_report(df: DataFrame) -> dict:
    """Inspect the physical plan of a scan: which columns are actually read
    (ReadSchema) and which predicates reached the source (PushedFilters)."""
    from ..plans.bucketing import plan_string

    plan = df._jdf.queryExecution().executedPlan().toString()
    explain = plan_string(df)
    read_schema = ""
    pushed = ""
    for line in explain.splitlines():
        s = line.strip()
        if s.startswith("ReadSchema:"):
            read_schema = s.split("ReadSchema:", 1)[1].strip()
        elif s.startswith("PushedFilters:"):
            pushed = s.split("PushedFilters:", 1)[1].strip()
    return {"read_schema": read_schema, "pushed_filters": pushed, "plan": plan}
