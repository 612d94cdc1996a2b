"""Partition-width helpers.

``widen`` fixes the small-file scan trap: a single-row-group parquet file scans
as ONE partition, so every downstream CPU-heavy per-row stage (shingle
explode, tokenization, pandas-UDF feature extraction) runs on one core no
matter how many the session has. One round-robin exchange of the (small)
input unlocks full width. At real data volumes the scan already yields many
partitions and this is a no-op — the guard makes the operator safe to keep in
the 100 TB plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the session's shuffle width if (and only if)
    its current partitioning is narrower."""
    target = min_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
