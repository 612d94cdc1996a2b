"""Bucketed (pre-shuffled) table layout — the co-located-join lever.

At 10^10 rows the recurring cost of a big equi-join is the shuffle of BOTH
sides on the join key, every run. Spark's bucketed layout pays that shuffle
ONCE at write time: `bucketBy(n, key)` hash-partitions files on disk and
records the layout in the catalog, so a SortMergeJoin of two tables bucketed
on the same key with the same bucket count needs NO Exchange on either side
(and with `sortBy` no Sort either) — the plan goes scan -> join. The crawl's
standing tables (seen set, frontier, per-host stats) are exactly the kind of
repeatedly-joined state this layout serves; `ManifestCatalog` keeps the
iteration-loop tables because it needs snapshot commits, while bucketing is
the right layout for the analytical side (reference parity: the reference's
Postgres keeps these as indexed tables, SURVEY.md §2.1 S8-S10).

Shuffle-free-ness is asserted in tests/test_bucketing.py by grepping the
executed plan for Exchange operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) on ``key``.

    ``path`` makes the table external (tests point it at a tmp dir); the
    bucket metadata lives in the session catalog either way.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back with the bucket layout intact (spark.table, NOT a raw
    parquet path read — a path read forgets bucketing and re-shuffles)."""
    return spark.table(table)


def plan_string(df: DataFrame) -> str:
    """Formatted physical plan (the string the no-Exchange assertions grep)."""
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
