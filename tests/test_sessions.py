"""Gap-based sessionization semantics on crafted event sequences."""

from __future__ import annotations

import datetime as dt

from crawler_service_spark.operators import sessions

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _ev(user, event_id, offset_s):
    return (user, event_id, T0 + dt.timedelta(seconds=offset_s))


def _mk(spark, rows):
    return spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp_ntz")


def test_session_boundaries_and_rollup(spark):
    # user 1: events at 0, 100, 200 (one session), then 2000 (gap>300 -> new),
    # user 2: single event
    df = _mk(spark, [
        _ev(1, 10, 0), _ev(1, 11, 100), _ev(1, 12, 200), _ev(1, 13, 2000),
        _ev(2, 20, 50),
    ])
    out = {
        (r["user_id"], r["session_id"]): r
        for r in sessions.session_rollup(df, gap_seconds=300).collect()
    }
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    assert out[(1, 1)]["n_events"] == 3
    assert out[(1, 1)]["duration_s"] == 200
    assert out[(1, 2)]["n_events"] == 1
    assert out[(1, 2)]["duration_s"] == 0
    assert out[(2, 1)]["n_events"] == 1


def test_gap_exactly_at_threshold_continues_session(spark):
    # gap == gap_seconds stays in-session (strict > starts a new one)
    df = _mk(spark, [_ev(1, 1, 0), _ev(1, 2, 300), _ev(1, 3, 601)])
    out = sessions.sessionize(df, gap_seconds=300).collect()
    by_id = {r["event_id"]: r["session_id"] for r in out}
    assert by_id == {1: 1, 2: 1, 3: 2}


def test_sessionize_partition_invariant(spark):
    rows = [_ev(u, u * 100 + i, i * 37 % 900) for u in range(1, 6) for i in range(20)]
    a = sessions.session_rollup(_mk(spark, rows).repartition(1), gap_seconds=120)
    b = sessions.session_rollup(_mk(spark, rows).repartition(13), gap_seconds=120)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
