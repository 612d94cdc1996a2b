"""Recrawl scheduling: change-rate estimation and tier booking must match a
literal Python walk of each URL's observation history."""

from __future__ import annotations

import calendar
from datetime import datetime, timedelta

from crawler_service_spark.operators.recrawl import DEFAULT_TIERS, recrawl_schedule

T0 = datetime(2024, 1, 1)


def _epoch(ts: datetime) -> int:
    """UTC epoch of a naive datetime (session tz is pinned UTC)."""
    return calendar.timegm(ts.timetuple())
SCHEMA = "obs_id long, url_id long, ts timestamp, content_sig string"


def _py_twin(rows):
    by_url: dict[int, list] = {}
    for oid, url, ts, sig in rows:
        by_url.setdefault(url, []).append((_epoch(ts), oid, sig))
    out = {}
    for url, obs in by_url.items():
        obs.sort(key=lambda r: (r[0], r[1]))
        changes = sum(
            1 for a, b in zip(obs, obs[1:]) if a[2] != b[2]
        )
        n = len(obs)
        rate = (1000 * changes) // (n - 1) if n > 1 else 0
        interval = next(s for th, s in sorted(DEFAULT_TIERS, reverse=True) if rate >= th)
        out[url] = (n, changes, rate, interval, obs[-1][0] + interval)
    return out


def test_matches_python_twin_with_ties_and_singletons(spark):
    rows = []
    oid = 0
    # url 0: flips every observation -> permille 1000 -> hourly
    for k in range(5):
        rows.append((oid, 0, T0 + timedelta(hours=k), f"s{k % 2}")); oid += 1
    # url 1: never changes -> 0 -> monthly
    for k in range(4):
        rows.append((oid, 1, T0 + timedelta(days=k), "same")); oid += 1
    # url 2: single observation -> rate 0 by contract
    rows.append((oid, 2, T0, "x")); oid += 1
    # url 3: timestamp TIES — order must fall back to obs_id
    rows.append((oid, 3, T0, "a")); oid += 1
    rows.append((oid, 3, T0, "b")); oid += 1
    rows.append((oid, 3, T0, "a")); oid += 1
    # url 4: 1 change in 3 pairs -> 333 -> weekly tier (>=100)
    for k, sig in enumerate(["p", "p", "q", "q"]):
        rows.append((oid, 4, T0 + timedelta(minutes=k), sig)); oid += 1

    df = spark.createDataFrame(rows, SCHEMA)
    expect = _py_twin(rows)
    for probe in (df, df.repartition(9)):
        got = {
            r["url_id"]: (
                r["n_obs"],
                r["n_changes"],
                r["change_permille"],
                r["revisit_s"],
                r["next_fetch_epoch_s"],
            )
            for r in recrawl_schedule(probe, order_col="obs_id").collect()
        }
        assert got == expect
    assert got[0][3] == 3_600
    assert got[1][3] == 2_592_000
    assert got[2] == (1, 0, 0, 2_592_000, _epoch(T0) + 2_592_000)
    assert got[3][1] == 2, "tie order by obs_id: a->b->a is two changes"
    assert got[4][3] == 604_800


def test_tier_boundaries_inclusive(spark):
    # craft exact boundary rates: 800 -> hourly, 799 -> daily band check
    rows = []
    oid = 0
    # url 10: 4/5 pairs changed = 800 exactly
    for k, sig in enumerate(["a", "b", "c", "d", "e", "e"]):
        rows.append((oid, 10, T0 + timedelta(seconds=k), sig)); oid += 1
    # url 11: 2/5 pairs changed = 400 exactly
    for k, sig in enumerate(["a", "a", "b", "b", "c", "c"]):
        rows.append((oid, 11, T0 + timedelta(seconds=k), sig)); oid += 1
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["url_id"]: r for r in recrawl_schedule(df, order_col="obs_id").collect()}
    assert (got[10]["change_permille"], got[10]["revisit_s"]) == (800, 3_600)
    assert (got[11]["change_permille"], got[11]["revisit_s"]) == (400, 86_400)


def test_null_signatures_count_as_changes(spark):
    """A failed fetch recorded with a NULL signature is an observable state
    flip: ['a', NULL, 'a', NULL, 'a'] changes on every adjacent pair. The
    null-UNSAFE `sig != prev` comparison used to zero all four pairs and
    book the flappiest URL into the static monthly tier."""
    rows = [
        (i, 7, T0 + timedelta(hours=i), sig)
        for i, sig in enumerate(["a", None, "a", None, "a"])
    ]
    out = recrawl_schedule(spark.createDataFrame(rows, SCHEMA)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_obs"] == 5
    assert r["n_changes"] == 4
    assert r["change_permille"] == 1000
    assert r["revisit_s"] == 3_600  # hourly tier, not monthly


def test_custom_ascending_tiers_without_zero_threshold(spark):
    """Tiers handed in ascending order with no 0-threshold entry: a URL
    below every threshold books the LOWEST tier's (coldest) interval — the
    old tiers[-1][1] initializer read the caller's last tuple and handed the
    most static page the hottest interval."""
    tiers = ((100, 604_800), (800, 3_600))  # ascending, no 0 threshold
    rows = [
        (0, 1, T0, "same"),
        (1, 1, T0 + timedelta(hours=1), "same"),  # static: 0 permille
        (2, 2, T0, "x"),
        (3, 2, T0 + timedelta(hours=1), "y"),  # flips: 1000 permille
    ]
    got = {
        r["url_id"]: r["revisit_s"]
        for r in recrawl_schedule(
            spark.createDataFrame(rows, SCHEMA), tiers=tiers
        ).collect()
    }
    assert got[1] == 604_800  # coldest tier, NOT the hourly 3_600
    assert got[2] == 3_600    # hottest tier still wins for real flappers
