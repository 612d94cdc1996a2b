"""Stream-stream event-time interval join (streaming/attribution.py): the
batch ``range_join`` over the drained inputs is the oracle — identical
inclusive-bounds inner semantics — plus restart exactly-once, cross-batch
matching through retained join state, and watermark eviction of stale state.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

from crawler_service_spark.streaming.attribution import run_attribution_stream

T0 = datetime(2026, 1, 1, 10, 0, 0)
WINDOW_S = 600  # 10-minute activation window
WATERMARK = "5 minutes"


def _write(spark, path, rows):
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long"
    ).coalesce(1).write.mode("append").parquet(path)


def _oracle(clicks, signups):
    """Literal python twin of the inclusive interval join."""
    return {
        (cu, ce, su_eid)
        for cu, ct, ce in clicks
        for su, st, su_eid in signups
        if su == cu and st <= ct <= st + timedelta(seconds=WINDOW_S)
    }


def _sink_set(spark, sink):
    return {
        (r["user_id"], r["click_event_id"], r["signup_event_id"])
        for r in spark.read.parquet(sink).collect()
    }


def test_stream_interval_join_matches_batch_oracle(spark, tmp_path):
    cdir, sdir = str(tmp_path / "clicks"), str(tmp_path / "signups")
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    os.makedirs(cdir)
    os.makedirs(sdir)

    signups1 = [
        (1, T0, 100),                              # window [10:00, 10:10]
        (2, T0 + timedelta(minutes=2), 200),       # window [10:02, 10:12]
    ]
    clicks1 = [
        (1, T0, 10),                               # == window start -> match
        (1, T0 + timedelta(minutes=10), 11),       # == window end -> match
        (1, T0 + timedelta(minutes=11), 12),       # past end -> no match
        (2, T0 + timedelta(minutes=1), 20),        # before user-2 window
        (3, T0 + timedelta(minutes=3), 30),        # no signup at all
    ]
    _write(spark, cdir, clicks1)
    _write(spark, sdir, signups1)
    run_attribution_stream(
        cdir, sdir, ckpt, sink, spark, window_seconds=WINDOW_S, watermark=WATERMARK
    )
    expect = _oracle(clicks1, signups1)
    assert _sink_set(spark, sink) == expect
    assert (1, 10, 100) in expect and (1, 11, 100) in expect  # both bounds hit
    assert not any(c == 12 or c == 20 or c == 30 for _, c, _s in expect)

    # --- drain 2: a NEW click matches a signup buffered in JOIN STATE from
    # drain 1 (cross-batch, cross-restart matching through the checkpoint).
    # The click must sit ABOVE drain 1's click-side watermark (max seen
    # T0+11m minus 5m = T0+6m) or it would be dropped as late — and inside
    # user 2's [T0+2m, T0+12m] window; the signup itself is retained because
    # the click watermark has not passed window-end + horizon yet.
    clicks2 = [(2, T0 + timedelta(minutes=7), 21)]
    _write(spark, cdir, clicks2)
    run_attribution_stream(
        cdir, sdir, ckpt, sink, spark, window_seconds=WINDOW_S, watermark=WATERMARK
    )
    expect2 = _oracle(clicks1 + clicks2, signups1)
    assert _sink_set(spark, sink) == expect2
    assert (2, 21, 200) in expect2  # the cross-batch match actually happened

    # --- drain 3: nothing new -> exactly-once, sink unchanged
    run_attribution_stream(
        cdir, sdir, ckpt, sink, spark, window_seconds=WINDOW_S, watermark=WATERMARK
    )
    assert _sink_set(spark, sink) == expect2


def test_stream_interval_join_evicts_stale_state(spark, tmp_path):
    """A signup whose window + watermark horizon has passed is evicted from
    join state; a click arriving long after cannot resurrect it."""
    cdir, sdir = str(tmp_path / "clicks"), str(tmp_path / "signups")
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    os.makedirs(cdir)
    os.makedirs(sdir)

    _write(spark, sdir, [(1, T0, 100)])
    # advance BOTH event-time clocks far past T0 + window + watermark
    far = T0 + timedelta(hours=2)
    _write(spark, cdir, [(9, far, 90)])
    _write(spark, sdir, [(9, far, 900)])
    run_attribution_stream(
        cdir, sdir, ckpt, sink, spark, window_seconds=WINDOW_S, watermark=WATERMARK
    )
    assert _sink_set(spark, sink) == {(9, 90, 900)}

    # this click WOULD match user-1's window by event time, but arrives after
    # the watermark evicted that signup — emitted matches stay stable
    _write(spark, cdir, [(1, T0 + timedelta(minutes=1), 19)])
    run_attribution_stream(
        cdir, sdir, ckpt, sink, spark, window_seconds=WINDOW_S, watermark=WATERMARK
    )
    assert _sink_set(spark, sink) == {(9, 90, 900)}


def test_batch_count_cumulative_across_empty_resumed_drain(spark, tmp_path):
    """The return value is 'micro-batches durably committed by this
    checkpoint so far', read from the commit log: it must stay cumulative
    across resumed drains, never reset, and never count a no-data idle
    progress event whose batch was never committed (lastProgress can report
    batchId 2 while the commit log holds {0, 1})."""
    from crawler_service_spark.streaming.attribution import committed_batches

    cdir, sdir = str(tmp_path / "clicks"), str(tmp_path / "signups")
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    os.makedirs(cdir)
    os.makedirs(sdir)
    _write(spark, cdir, [(1, T0, 10)])
    _write(spark, sdir, [(1, T0, 100)])

    n1 = run_attribution_stream(
        cdir, sdir, ckpt, sink, spark,
        window_seconds=WINDOW_S, watermark=WATERMARK,
    )
    assert n1 >= 1
    assert committed_batches(ckpt) == n1
    # nothing new: the resumed drain stays cumulative (monotone, not 0;
    # a stateful resume MAY commit one watermark-bookkeeping batch)
    n2 = run_attribution_stream(
        cdir, sdir, ckpt, sink, spark,
        window_seconds=WINDOW_S, watermark=WATERMARK,
    )
    assert n1 <= n2 <= n1 + 1
    assert committed_batches(ckpt) == n2
    # no checkpoint at all -> zero, not an exception
    assert committed_batches(str(tmp_path / "nonexistent")) == 0
