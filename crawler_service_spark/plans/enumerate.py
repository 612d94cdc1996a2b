"""Distributed, deterministic global sequence numbers.

The crawl-order contract needs a total enumeration of rows by a sort key (the
oracle's FIFO position). A naive ``row_number().over(Window.orderBy(...))``
collapses everything into ONE partition — fine at 10^4 rows, fatal at 10^10.

This is the standard two-pass distributed enumeration instead:
 1. range-repartition + sort within partitions by the key (one shuffle);
 2. count rows per partition (tiny driver-side collect — #partitions values);
 3. mapInPandas stamps ``seq = partition_offset + local_index`` streaming, in
    order, never materializing a partition in memory.

Deterministic as long as ``order_cols`` is a TOTAL order (callers must include
a unique tiebreak column) — range boundaries may vary run-to-run, but
offset+local-index depends only on the global sort order, not the boundaries.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PID = "__pid"


def with_global_seq(
    df: DataFrame,
    order_cols: list,
    seq_col: str = "seq",
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``seq_col`` = start + global rank (0-based) by ``order_cols``."""
    n = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    part = (
        df.repartitionByRange(int(n), *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn(_PID, F.spark_partition_id())
    )
    # lazy checkpoint: the count job below materializes it; the stamp pass and
    # all later consumers then read pinned blocks (same layout, no recompute)
    part = part.localCheckpoint(eager=False)
    counts = {r[_PID]: r["cnt"] for r in part.groupBy(_PID).agg(F.count("*").alias("cnt")).collect()}
    offsets: dict[int, int] = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    from pyspark.sql import types as T

    # fresh StructType — StructType.add() mutates the cached schema in place
    out_schema = T.StructType(
        [f for f in part.schema.fields if f.name != _PID]
        + [T.StructField(seq_col, T.LongType(), False)]
    )

    def stamp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            off = offsets.get(int(pdf[_PID].iloc[0]), start)
            pdf = pdf.drop(columns=[_PID])
            pdf[seq_col] = range(off + local, off + local + len(pdf))
            local += len(pdf)
            yield pdf

    return part.mapInPandas(stamp, schema=out_schema)
