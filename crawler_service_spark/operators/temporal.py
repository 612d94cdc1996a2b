"""Temporal joins — the as-of join Spark's DataFrame API lacks.

An as-of (backward) join attaches to every probe row the single build row
with the greatest build-timestamp <= probe-timestamp for the same key — the
"most recent prior state" lookup behind attribution (purchase <- last view),
fetch-vs-snapshot reconciliation (which frontier snapshot was live when this
URL was fetched), and any slowly-changing-dimension read. The reference
resolves this imperatively (per-row queue/state lookups as it processes
results); batch engines express it as a sorted merge.

Spark has no ASOF JOIN operator, and the naive emulations both fail at
scale: an inequality theta-join explodes to |probes|x|states| per key before
filtering, and a per-key ``collect_list`` + UDF search abandons codegen.
The scalable composition here is the textbook union-merge (what
pandas.merge_asof does after its sort, distributed on the key):

1. tag build rows 0 and probe rows 1, union them into one frame whose only
   payload is a single struct column per side (schemas never collide);
2. ONE window over ``(key) ORDER BY (ts, side, tiebreak)`` carries the last
   non-null build payload forward (``last(ignorenulls=True)`` with a
   growing frame) — at equal ts the build row sorts first, so the boundary
   match is INCLUSIVE, matching DuckDB's ``ASOF JOIN ... ON p.ts >= s.ts``;
3. keep probe rows, unpack the carried struct (null = no prior state:
   LEFT-asof semantics).

Cost: one shuffle of probes+builds on the key and a per-key sort — the same
partitioning every sessionization already pays; no join blow-up, no UDF.
Skewed keys sort within their partition like any windowed op (AQE handles
stragglers; a salt is NOT applicable because the carry-forward is
order-dependent across the whole key).

Determinism: build rows tying on (key, ts) are broken by ``tiebreak_col``
DESC-last (the carried value is the max tiebreak), so results are
partition-invariant; make the tiebreak unique per (key, ts) — or pre-dedupe
— for a fully pinned contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    probes: DataFrame,
    states: DataFrame,
    on: list[str] | str,
    probe_ts: str = "ts",
    state_ts: str = "ts",
    state_cols: list[str] | None = None,
    suffix: str = "_state",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Backward as-of LEFT join: every probe row gains the state row with
    the greatest ``state_ts <= probe_ts`` per key (inclusive), or nulls.

    ``state_cols`` are the state columns to carry (default: all but key/ts);
    they come back suffixed. ``state_ts`` itself is always carried (suffixed)
    so callers can compute staleness. ``tiebreak_col`` orders state rows
    tying on (key, ts); the max wins.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if state_cols is None:
        state_cols = [
            c for c in states.columns if c not in keys and c != state_ts
        ]
    carried = [state_ts] + [c for c in state_cols if c != state_ts]

    build = states.select(
        *keys,
        F.col(state_ts).cast("timestamp").alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in carried]).alias("__sv"),
        (F.col(tiebreak_col) if tiebreak_col else F.lit(0)).alias("__tb"),
    )
    probe = probes.select(
        *keys,
        F.col(probe_ts).cast("timestamp").alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(build.schema["__sv"].dataType).alias("__sv"),
        F.lit(0).alias("__tb"),
        F.struct(*[F.col(c) for c in probes.columns]).alias("__pv"),
    )
    build = build.withColumn(
        "__pv", F.lit(None).cast(probe.schema["__pv"].dataType)
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = (
        probe.unionByName(build.select(*probe.columns))
        .withColumn("__carried", F.last("__sv", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    out_cols = [F.col(f"__pv.{c}").alias(c) for c in probes.columns]
    out_cols += [
        F.col(f"__carried.{c}").alias(f"{c}{suffix}") for c in carried
    ]
    return merged.select(*out_cols)
