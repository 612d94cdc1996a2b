"""As-of join contract: backward inclusive, deterministic ties, LEFT
semantics, partition invariance — pinned against a literal Python twin."""

from __future__ import annotations

from datetime import datetime

from crawler_service_spark.operators.temporal import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_matches_python_twin(spark):
    probes = [
        (1, _ts("2026-01-01 10:00:00"), 100),  # exactly at a state ts -> inclusive
        (1, _ts("2026-01-01 10:30:00"), 101),  # between states
        (1, _ts("2026-01-01 09:00:00"), 102),  # before any state -> nulls
        (2, _ts("2026-01-01 12:00:00"), 200),  # key with one state
        (3, _ts("2026-01-01 12:00:00"), 300),  # key with no states at all
    ]
    states = [
        (1, _ts("2026-01-01 10:00:00"), 7),
        (1, _ts("2026-01-01 10:15:00"), 8),
        (1, _ts("2026-01-01 11:00:00"), 9),
        (2, _ts("2026-01-01 11:59:59"), 77),
    ]
    p = spark.createDataFrame(probes, "k long, ts timestamp, pid long")
    s = spark.createDataFrame(states, "k long, ts timestamp, sid long")

    def twin():
        out = {}
        for k, pt, pid in probes:
            best = None
            for sk, st, sid in states:
                if sk == k and st <= pt and (best is None or st > best[0]):
                    best = (st, sid)
            out[pid] = (k, pt, best[1] if best else None, best[0] if best else None)
        return out

    expect = twin()
    for probe_df in (p, p.repartition(4)):
        rows = asof_join(
            probe_df, s, on="k", state_cols=["sid"], suffix="_s"
        ).collect()
        got = {
            r["pid"]: (r["k"], r["ts"], r["sid_s"], r["ts_s"]) for r in rows
        }
        assert got == expect
    # the fixture exercises all three regimes
    assert expect[100][2] == 7  # inclusive boundary
    assert expect[101][2] == 8  # strictly-prior pick
    assert expect[102][2] is None and expect[300][2] is None  # LEFT nulls


def test_asof_join_null_ts_state_rows_never_match(spark):
    """A state row with NULL ts must match NOTHING (p.ts >= NULL is NULL in
    the SQL contract) — not get carried to every probe before the first real
    state row by the merge window's nulls-first sort."""
    p = spark.createDataFrame(
        [
            (1, _ts("2026-01-01 09:00:00"), 1),  # before any real state
            (1, _ts("2026-01-01 10:30:00"), 2),  # after the real state
        ],
        "k long, ts timestamp, pid long",
    )
    s = spark.createDataFrame(
        [(1, None, 666), (1, _ts("2026-01-01 10:00:00"), 7)],
        "k long, ts timestamp, sid long",
    )
    rows = {
        r["pid"]: r["sid_state"]
        for r in asof_join(p, s, on="k", state_cols=["sid"]).collect()
    }
    assert rows == {1: None, 2: 7}
    # NULL-ts PROBES take LEFT nulls (NULL >= anything is NULL -> no match)
    pn = spark.createDataFrame([(1, None, 3)], "k long, ts timestamp, pid long")
    (r,) = asof_join(pn, s, on="k", state_cols=["sid"]).collect()
    assert r["sid_state"] is None


def test_asof_join_tiebreak_max_wins(spark):
    """Two state rows tying on (key, ts): the max tiebreak_col row carries."""
    p = spark.createDataFrame(
        [(1, _ts("2026-01-01 10:00:01"), 1)], "k long, ts timestamp, pid long"
    )
    s = spark.createDataFrame(
        [
            (1, _ts("2026-01-01 10:00:00"), 5, "low"),
            (1, _ts("2026-01-01 10:00:00"), 9, "high"),
        ],
        "k long, ts timestamp, sid long, tag string",
    )
    for probe in (p, p.repartition(3)):
        rows = asof_join(
            probe, s, on="k", state_cols=["sid", "tag"], tiebreak_col="sid"
        ).collect()
        assert len(rows) == 1
        assert (rows[0]["sid_state"], rows[0]["tag_state"]) == (9, "high")


def test_range_join_matches_python_twin(spark):
    """Range join: inclusive on both bounds, every containing interval
    matched, invariant to bucket width and partitioning."""
    from crawler_service_spark.operators.temporal import range_join

    points = [
        (1, _ts("2026-01-01 10:00:00"), 1),   # == start of iv 100 -> match
        (1, _ts("2026-01-01 10:30:00"), 2),   # inside iv 100 AND iv 101
        (1, _ts("2026-01-01 11:00:00"), 3),   # == end of iv 100 -> match
        (1, _ts("2026-01-01 11:00:01"), 4),   # just past end of 100, in 101
        (1, _ts("2026-01-01 09:59:59"), 5),   # before everything -> dropped
        (2, _ts("2026-01-01 10:30:00"), 6),   # right key-range, wrong key
    ]
    ivs = [
        (1, _ts("2026-01-01 10:00:00"), _ts("2026-01-01 11:00:00"), 100),
        (1, _ts("2026-01-01 10:15:00"), _ts("2026-01-01 12:00:00"), 101),
        (3, _ts("2026-01-01 10:00:00"), _ts("2026-01-01 11:00:00"), 300),
    ]
    p = spark.createDataFrame(points, "k long, ts timestamp, pid long")
    iv = spark.createDataFrame(
        ivs, "k long, start_ts timestamp, end_ts timestamp, ivid long"
    )

    expect = {
        (pid, ivid)
        for k, pt, pid in points
        for ik, s, e, ivid in ivs
        if ik == k and s <= pt <= e
    }
    assert (2, 100) in expect and (2, 101) in expect  # multi-match exercised

    for probe, width in ((p, 600), (p.repartition(4), 600), (p, 7), (p, 86400)):
        rows = range_join(
            probe, iv, on="k", point_ts="ts", bucket_seconds=width
        ).collect()
        got = {(r["pid"], r["ivid_iv"]) for r in rows}
        assert got == expect, (width, got ^ expect)


def test_asof_join_null_key_rows_never_match(spark):
    """SQL equi-keys never match NULL: a NULL-key probe must come back with
    NULL state even when a NULL-key state row exists (partitionBy groups
    NULLs together — GROUP BY semantics — so the merge window used to carry
    the NULL-key state onto the NULL-key probe, rows DuckDB's ASOF JOIN says
    don't exist). Non-null keys are unaffected."""
    p = spark.createDataFrame(
        [(None, _ts("2026-01-01 10:00:00"), 100),
         (1, _ts("2026-01-01 10:00:00"), 101)],
        "k long, ts timestamp, pid long",
    )
    s = spark.createDataFrame(
        [(None, _ts("2026-01-01 09:00:00"), 7),
         (1, _ts("2026-01-01 09:00:00"), 8)],
        "k long, ts timestamp, sid long",
    )
    rows = asof_join(p, s, on="k", state_cols=["sid"], suffix="_s").collect()
    got = {r["pid"]: r["sid_s"] for r in rows}
    assert len(rows) == 2  # LEFT: the NULL-key probe row itself survives
    assert got[100] is None
    assert got[101] == 8


def test_asof_join_keyless_global_lookup(spark):
    """on=[] is the keyless/global as-of: every probe gains the most recent
    prior-or-simultaneous state across the WHOLE state stream (one global
    window). The NULL-key filter's reduce must not choke on zero keys."""
    p = spark.createDataFrame(
        [(_ts("2026-01-01 10:00:00"), 100),
         (_ts("2026-01-01 08:00:00"), 101)],
        "ts timestamp, pid long",
    )
    s = spark.createDataFrame(
        [(_ts("2026-01-01 09:00:00"), 7),
         (_ts("2026-01-01 07:00:00"), 8)],
        "ts timestamp, sid long",
    )
    got = {
        r["pid"]: r["sid_s"]
        for r in asof_join(p, s, on=[], state_cols=["sid"], suffix="_s").collect()
    }
    assert got == {100: 7, 101: 8}
