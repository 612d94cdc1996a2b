"""Stream-stream event-time interval join — the streaming twin of the batch
temporal joins (``operators/temporal.py``).

The batch side answers "which click landed inside the post-signup activation
window" with a bucketed range join; when BOTH sides arrive as live feeds (the
crawl emitting fetch events while the scheduler emits booking windows, or a
clickstream joining a signup stream), the same question is Spark's native
stream-stream inner join with watermarks on both sides and an event-time
range condition:

- each side declares a watermark = its max tolerated out-of-orderness;
- the join condition is ``equal key AND point_ts in [start_ts, start_ts +
  window]`` — the time bound is what lets Spark EVICT buffered state: a
  buffered left row can only ever match right rows within the interval, so
  once the right watermark passes ``point_ts`` (and vice versa) the row is
  dropped from the state store instead of buffering forever;
- output is append-mode (a match emits exactly once, when both sides have
  arrived), exactly-once into a file sink via the checkpoint + sink commit
  log.

This is the one temporal-join shape Structured Streaming supports natively
(inner with time bounds; outer variants emit nulls only after watermark
expiry). The as-of "most recent prior" pick is NOT expressible as a pure
stream-stream join (it needs per-key ordering state); its streaming form is
the batch ``asof_join`` run per micro-batch against a snapshot, or an
``applyInPandasWithState`` ordering operator like ``streaming/stateful.py``.

Reference analogue: the reference correlates fetch results back to the
submitting crawl task imperatively in its worker loop
(crawlers/globus_base_preserved.py result handling); the streaming join is
that correlation as a declarative, restart-safe operator.

Scale shape: both streams shuffle once on the (uniform) join key; state per
key is bounded by the watermark horizon x arrival rate, not stream length —
the property that matters on an unbounded 10^10-event feed. Skewed keys
split under AQE like any equi-join; the interval bound keeps per-row match
fan-out at the interval's true cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CLICK_SCHEMA = "user_id long, ts timestamp, event_id long"
SIGNUP_SCHEMA = "user_id long, ts timestamp, event_id long"


def interval_join_streams(
    points: DataFrame,
    intervals: DataFrame,
    on: str = "user_id",
    window_seconds: int = 3600,
    point_watermark: str = "10 minutes",
    interval_watermark: str = "10 minutes",
    point_ts: str = "ts",
    interval_ts: str = "ts",
) -> DataFrame:
    """Join two STREAMING frames: every point row matched to every interval-
    opening row of the same key whose ``[open, open + window_seconds]`` range
    contains it (inclusive both ends — the batch ``range_join`` contract).

    Both inputs must be streaming DataFrames; the result is a streaming
    frame for ``writeStream`` (append mode). Columns come back prefixed
    ``p_`` / ``iv_`` (the join key unprefixed) so arbitrary same-named
    payloads never collide.
    """
    p = points.withWatermark(point_ts, point_watermark).select(
        F.col(on).alias("__k"),
        F.col(point_ts).alias("p_ts"),
        *[
            F.col(c).alias(f"p_{c}")
            for c in points.columns
            if c not in (on, point_ts)
        ],
    )
    iv = intervals.withWatermark(interval_ts, interval_watermark).select(
        F.col(on).alias("__iv_k"),
        F.col(interval_ts).alias("iv_ts"),
        *[
            F.col(c).alias(f"iv_{c}")
            for c in intervals.columns
            if c not in (on, interval_ts)
        ],
    )
    joined = p.join(
        iv,
        (F.col("__k") == F.col("__iv_k"))
        & (F.col("p_ts") >= F.col("iv_ts"))
        & (F.col("p_ts") <= F.col("iv_ts") + F.expr(f"INTERVAL {int(window_seconds)} SECONDS")),
        "inner",
    )
    return joined.select(F.col("__k").alias(on), *[c for c in joined.columns if c not in ("__k", "__iv_k")])


def attribution_stream(
    clicks: DataFrame,
    signups: DataFrame,
    window_seconds: int = 3600,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Click→signup activation attribution over two live streams: every
    click inside the ``window_seconds`` activation window following a signup
    by the same user (the streaming twin of the registered
    ``events_range_activation`` query — identical inclusive-bounds inner
    semantics, so the batch ``range_join`` over the drained inputs is the
    test oracle)."""
    out = interval_join_streams(
        clicks,
        signups,
        on="user_id",
        window_seconds=window_seconds,
        point_watermark=watermark,
        interval_watermark=watermark,
    )
    return out.select(
        "user_id",
        F.col("p_event_id").alias("click_event_id"),
        F.unix_millis("p_ts").alias("click_ms"),
        F.col("iv_event_id").alias("signup_event_id"),
        F.unix_millis("iv_ts").alias("window_start_ms"),
    )


def run_attribution_stream(
    clicks_dir: str,
    signups_dir: str,
    checkpoint_dir: str,
    sink_dir: str,
    spark,
    window_seconds: int = 3600,
    watermark: str = "10 minutes",
) -> int:
    """Drain the currently-available click/signup files through the
    stream-stream interval join into a parquet sink (AvailableNow — the
    long-poll drain shape every other streaming harness here uses).
    Exactly-once: checkpoint dedupes inputs, the sink commit log fences
    output. Returns the number of micro-batches durably committed by this
    checkpoint so far, read from its commit log — cumulative across
    resumed drains. The log is the only honest source: ``recentProgress``
    caps at the retention limit (default 100) on a long drain, and
    ``lastProgress`` can carry a no-data idle event whose batchId was
    never committed (observed: progress batchId 2 with commits {0, 1})."""
    clicks = (
        spark.readStream.schema(CLICK_SCHEMA).parquet(clicks_dir)
    )
    signups = (
        spark.readStream.schema(SIGNUP_SCHEMA).parquet(signups_dir)
    )
    out = attribution_stream(
        clicks, signups, window_seconds=window_seconds, watermark=watermark
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return committed_batches(checkpoint_dir)


def committed_batches(checkpoint_dir: str) -> int:
    """Micro-batches durably committed by a checkpoint (last id + 1), read
    from its ``commits/`` log — the ground truth that survives restarts and
    does not depend on any live query object."""
    import os

    commits = os.path.join(checkpoint_dir, "commits")
    ids = (
        [int(n) for n in os.listdir(commits) if n.isdigit()]
        if os.path.isdir(commits)
        else []
    )
    return max(ids) + 1 if ids else 0
