"""Temporal joins — the as-of join Spark's DataFrame API lacks.

An as-of (backward) join attaches to every probe row the single build row
with the greatest build-timestamp <= probe-timestamp for the same key — the
"most recent prior state" lookup behind attribution (purchase <- last view),
fetch-vs-snapshot reconciliation (which frontier snapshot was live when this
URL was fetched), and any slowly-changing-dimension read. The reference
resolves this imperatively — per-row reads of mutable worker/crawl state
as results arrive (reference crawlers/globus_base_preserved.py:59-60
``crawl_status``/``worker_status_dict``, application.py status lookups);
batch engines express the same "state as of this row's time" as a sorted
merge.

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

import functools

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
    ).filter(
        # a NULL-ts or NULL-key state row can never be "the most recent
        # prior state" (p.ts >= NULL is NULL, and SQL equi-keys never match
        # NULL), but the merge window would otherwise carry it: nulls-first
        # sort hands a NULL-ts row to every probe, and partitionBy groups
        # NULL keys together (GROUP BY semantics) so a NULL-key probe would
        # match a NULL-key state — rows DuckDB's ASOF JOIN says don't exist.
        # NULL-key PROBES stay: they ride their (empty) partition and come
        # back with NULL state, the LEFT contract.
        F.col("__t").isNotNull()
        # initializer keeps on=[] (keyless/global as-of) working: the
        # conjunction over zero keys is vacuously true
        & functools.reduce(
            lambda a, b: a & b,
            [F.col(k).isNotNull() for k in keys],
            F.lit(True),
        )
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


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str] | str,
    point_ts: str = "ts",
    start_ts: str = "start_ts",
    end_ts: str = "end_ts",
    interval_cols: list[str] | None = None,
    suffix: str = "_iv",
    bucket_seconds: int = 600,
) -> DataFrame:
    """Range (interval) join — every point row matched to EVERY interval
    row of the same key containing it (inclusive ``[start, end]``, inner
    semantics): fetch-events vs maintenance windows, clicks vs campaign
    windows, observations vs sessions.

    Spark would execute the naive ``p.ts BETWEEN iv.start AND iv.end``
    predicate as a per-key theta join — |points|x|intervals| comparisons
    per key. The standard scalable rewrite buckets time into fixed
    ``bucket_seconds`` cells: each interval explodes to the cells it
    covers (fanout = ceil(len/width) + 1, bounded for bounded intervals),
    each point maps to exactly one cell, and the match becomes an
    EQUI-join on (key, cell) followed by the exact boundary filter.
    Pick ``bucket_seconds`` near the typical interval length: fanout stays
    O(1) per interval and each join cell holds only co-bucketed rows.

    One shuffle of each side on the uniform (key, cell) pair; no window,
    no UDF, no cartesian. Unbounded/highly-variable interval lengths want
    a two-tier cell size (coarse + fine); this single-tier version states
    the contract and is exact for any input.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if interval_cols is None:
        interval_cols = [
            c
            for c in intervals.columns
            if c not in keys and c not in (start_ts, end_ts)
        ]
    w = int(bucket_seconds)

    p = points.withColumn(
        "__cell",
        F.floor(F.unix_seconds(F.col(point_ts).cast("timestamp")) / w).cast("long"),
    )
    iv = intervals.withColumn(
        "__cell",
        F.explode(
            F.sequence(
                F.floor(
                    F.unix_seconds(F.col(start_ts).cast("timestamp")) / w
                ).cast("long"),
                F.floor(
                    F.unix_seconds(F.col(end_ts).cast("timestamp")) / w
                ).cast("long"),
            )
        ),
    )
    carried = [start_ts, end_ts] + [
        c for c in interval_cols if c not in (start_ts, end_ts)
    ]
    iv_sel = iv.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        "__cell",
        *[F.col(c).alias(f"{c}{suffix}") for c in carried],
    )
    cond = [p[k] == iv_sel[f"__k_{k}"] for k in keys] + [
        p["__cell"] == iv_sel["__cell"]
    ]
    joined = p.join(iv_sel, cond, "inner").filter(
        (F.col(point_ts).cast("timestamp") >= F.col(f"{start_ts}{suffix}").cast("timestamp"))
        & (F.col(point_ts).cast("timestamp") <= F.col(f"{end_ts}{suffix}").cast("timestamp"))
    )
    return joined.select(
        *[p[c] for c in points.columns], *[F.col(f"{c}{suffix}") for c in carried]
    )
