"""Hypothesis property tests: the late round-5 operators (as-of join,
range join, sequence packing, budget apportionment) vs literal pure-Python
twins on randomized inputs — shrinking finds the boundary cases crafted
fixtures miss (simultaneous timestamps, empty-state keys, zero-token docs,
all-tied remainders, budgets larger than the score mass)."""

from __future__ import annotations

import re
from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from crawler_service_spark.operators import packing, politeness, temporal

T0 = datetime(2026, 1, 1)


def _t(s: int) -> datetime:
    return T0 + timedelta(seconds=s)


# ---------------------------------------------------------------- as-of join

@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    probes=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 20)), min_size=1, max_size=12
    ),
    states=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 20)), max_size=12
    ),
)
def test_asof_join_matches_python_twin_random(spark, probes, states):
    """Backward-inclusive as-of with a deterministic tiebreak: identical to
    the quadratic Python scan on random streams where keys collide, states
    tie on (key, ts), and some keys have no state at all."""
    p_rows = [(k, _t(t), i) for i, (k, t) in enumerate(probes)]
    s_rows = [(k, _t(t), i) for i, (k, t) in enumerate(states)]
    p = spark.createDataFrame(p_rows, "k long, ts timestamp, pid long")
    s = spark.createDataFrame(s_rows, "k long, ts timestamp, sid long")

    expect = {}
    for k, pt, pid in p_rows:
        best = None  # max by (state_ts, sid) among state_ts <= probe_ts
        for sk, stt, sid in s_rows:
            if sk == k and stt <= pt and (best is None or (stt, sid) > best):
                best = (stt, sid)
        expect[pid] = best[1] if best else None

    got = {
        r["pid"]: r["sid_state"]
        for r in temporal.asof_join(
            p, s, on="k", state_cols=["sid"], tiebreak_col="sid"
        ).collect()
    }
    assert got == expect


# --------------------------------------------------------------- range join

@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    points=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 40)), min_size=1, max_size=10
    ),
    intervals=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 40), st.integers(0, 15)),
        max_size=8,
    ),
    width=st.sampled_from([1, 7, 600]),
)
def test_range_join_matches_python_twin_random(spark, points, intervals, width):
    """Interval containment is the Python double loop, at any bucket width —
    including width 1 (every interval explodes to every covered cell) and a
    width dwarfing every interval (all rows co-bucketed)."""
    p_rows = [(k, _t(t), i) for i, (k, t) in enumerate(points)]
    iv_rows = [
        (k, _t(a), _t(a + ln), i) for i, (k, a, ln) in enumerate(intervals)
    ]
    p = spark.createDataFrame(p_rows, "k long, ts timestamp, pid long")
    iv = spark.createDataFrame(
        iv_rows, "k long, start_ts timestamp, end_ts timestamp, ivid long"
    )

    expect = {
        (pid, ivid)
        for k, pt, pid in p_rows
        for ik, a, b, ivid in iv_rows
        if ik == k and a <= pt <= b
    }
    got = {
        (r["pid"], r["ivid_iv"])
        for r in temporal.range_join(p, iv, on="k", bucket_seconds=width).collect()
    }
    assert got == expect


# ----------------------------------------------------------------- packing

def _py_pack(doc_texts: list[tuple[int, str]], L: int):
    """Literal one-machine packing: lay tokenized docs end-to-end in doc_id
    order (zero-token docs occupy no space), cut every L tokens."""
    toks = {
        d: [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        for d, t in doc_texts
    }
    docs = sorted((d, len(ws)) for d, ws in toks.items() if ws)
    seqs: dict[int, list[tuple[int, int, bool]]] = {}
    start = 0
    for d, n in docs:
        first, last = start // L, (start + n - 1) // L
        for s in range(first, last + 1):
            tok_here = min((s + 1) * L, start + n) - max(s * L, start)
            seqs.setdefault(s, []).append((d, tok_here, s == last))
        start += n
    return {
        s: (
            len(rows),
            sum(t for _, t, _ in rows),
            sum(1 for _, _, end in rows if end),
            min(d for d, _, _ in rows),
            max(d for d, _, _ in rows),
        )
        for s, rows in seqs.items()
    }


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "bb", "ccc", ""]), max_size=9),
        min_size=1,
        max_size=10,
    ),
    seq_len=st.integers(1, 13),
    bucket=st.sampled_from([1, 3, 8]),
)
def test_pack_sequences_matches_python_twin_random(spark, docs, seq_len, bucket):
    """Distributed two-level-scan packing == the literal cumulative layout,
    for any (seq_len, bucket_size), with gappy doc_ids and zero-token docs
    interleaved. Conservation: sum(n_tokens) over sequences == corpus total."""
    rows = [(i * 3, " ".join(ws)) for i, ws in enumerate(docs)]  # gappy ids
    df = spark.createDataFrame(rows, "doc_id long, text string")
    expect = _py_pack(rows, seq_len)
    got = {
        r["seq_id"]: (
            r["n_docs"], r["n_tokens"], r["n_doc_ends"],
            r["first_doc_id"], r["last_doc_id"],
        )
        for r in packing.pack_sequences(
            df, seq_len=seq_len, bucket_size=bucket
        ).collect()
    }
    assert got == expect
    assert sum(v[1] for v in got.values()) == sum(
        len([w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]) for _, t in rows
    )


# ---------------------------------------------------- budget apportionment

@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    scores=st.lists(st.integers(-2, 9), min_size=1, max_size=12),
    budget=st.integers(1, 300),
)
def test_budget_allocation_matches_python_twin_random(spark, scores, budget):
    """Hamilton apportionment == the literal sort-by-remainder Python twin on
    random score vectors (zeros/negatives excluded by contract, ties broken
    host-ASC), and sum(budget) == B bit-exactly whenever any host qualifies —
    including budgets far above and far below the score mass."""
    rows = [(f"h{i:02d}", s) for i, s in enumerate(scores)]
    df = spark.createDataFrame(rows, "host string, score long")

    pos = [(h, s) for h, s in rows if s > 0]
    expect = {}
    if pos:
        total = sum(s for _, s in pos)
        floors = {h: (budget * s) // total for h, s in pos}
        rems = {h: (budget * s) % total for h, s in pos}
        leftover = budget - sum(floors.values())
        winners = {
            h for h, _ in sorted(pos, key=lambda hs: (-rems[hs[0]], hs[0]))[:leftover]
        }
        expect = {
            h: (s, floors[h], rems[h], floors[h] + (1 if h in winners else 0))
            for h, s in pos
        }

    got = {
        r["host"]: (r["score"], r["floor_share"], r["rem"], r["budget"])
        for r in politeness.budget_allocation(df, total_budget=budget).collect()
    }
    assert got == expect
    if pos:
        assert sum(v[3] for v in got.values()) == budget


# ------------------------------------------- as-of join with dirty rows

@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    probes=st.lists(
        st.tuples(
            st.sampled_from([None, 0, 1]),
            st.sampled_from([None, 0, 3, 7, 20]),
        ),
        min_size=1,
        max_size=12,
    ),
    states=st.lists(
        st.tuples(
            st.sampled_from([None, 0, 1]),
            st.sampled_from([None, 0, 3, 7, 20]),
        ),
        max_size=12,
    ),
)
def test_asof_join_dirty_rows_match_python_twin_random(spark, probes, states):
    """ANSI-SQL dirty-row semantics on random NULL-laced streams: a NULL key
    or NULL timestamp on the state side never matches anything (equi-keys
    don't match NULL, ts >= NULL is NULL), and a NULL-key or NULL-ts PROBE
    survives with NULL state (LEFT). The twin is the quadratic scan with
    exactly those guards."""
    p_rows = [(k, _t(t) if t is not None else None, i) for i, (k, t) in enumerate(probes)]
    s_rows = [(k, _t(t) if t is not None else None, i) for i, (k, t) in enumerate(states)]
    p = spark.createDataFrame(p_rows, "k long, ts timestamp, pid long")
    s = spark.createDataFrame(s_rows, "k long, ts timestamp, sid long")

    expect = {}
    for k, pt, pid in p_rows:
        best = None  # max by (state_ts, sid) among matching states
        if k is not None and pt is not None:
            for sk, stt, sid in s_rows:
                if (
                    sk == k
                    and stt is not None
                    and stt <= pt
                    and (best is None or (stt, sid) > best)
                ):
                    best = (stt, sid)
        expect[pid] = best[1] if best else None

    got = {
        r["pid"]: r["sid_state"]
        for r in temporal.asof_join(
            p, s, on="k", state_cols=["sid"], tiebreak_col="sid"
        ).collect()
    }
    assert got == expect


# ---------------------------------------- recrawl scheduling, NULL-laced

@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    obs=st.lists(
        st.tuples(
            st.integers(0, 2),
            st.integers(0, 5),
            st.sampled_from([None, "a", "b"]),
        ),
        min_size=1,
        max_size=15,
    ),
    tiers=st.sampled_from(
        [
            ((800, 3_600), (400, 86_400), (100, 604_800), (0, 2_592_000)),
            ((100, 604_800), (800, 3_600)),  # ascending, no 0 threshold
            ((500, 10),),  # single tier, fallback below it
        ]
    ),
)
def test_recrawl_schedule_matches_python_twin_random(spark, obs, tiers):
    """Change-rate estimation on random NULL-laced observation histories with
    timestamp ties: a NULL signature IS DISTINCT FROM any non-NULL neighbour
    (and not from another NULL), ties break on obs_id, and a rate below every
    tier threshold books the LOWEST tier's interval. The twin is the literal
    per-URL walk — Python `!=` on None is exactly IS DISTINCT FROM."""
    import calendar

    from crawler_service_spark.operators.recrawl import recrawl_schedule

    rows = [(i, url, T0 + timedelta(seconds=t), sig) for i, (url, t, sig) in enumerate(obs)]
    df = spark.createDataFrame(
        rows, "obs_id long, url_id long, ts timestamp, content_sig string"
    )

    by_url: dict[int, list] = {}
    for oid, url, ts, sig in rows:
        epoch = calendar.timegm(ts.timetuple())
        by_url.setdefault(url, []).append((epoch, oid, sig))
    expect = {}
    ordered = sorted(tiers)
    for url, o in by_url.items():
        o.sort(key=lambda r: (r[0], r[1]))
        changes = sum(1 for a, b in zip(o, o[1:]) if a[2] != b[2])
        n = len(o)
        rate = (1000 * changes) // (n - 1) if n > 1 else 0
        interval = ordered[0][1]
        for th, s in ordered:
            if rate >= th:
                interval = s
        expect[url] = (n, changes, rate, interval, o[-1][0] + interval)

    got = {
        r["url_id"]: (
            r["n_obs"],
            r["n_changes"],
            r["change_permille"],
            r["revisit_s"],
            r["next_fetch_epoch_s"],
        )
        for r in recrawl_schedule(df, tiers=tiers).collect()
    }
    assert got == expect


# ------------------------------------------- host budgets, junk delays

@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["h0", "h1", "h2"]),
            st.sampled_from([None, -1.0, 0.0, 1e-9, 0.5, 1.0, 3.0, 7.5]),
        ),
        min_size=1,
        max_size=10,
    ),
    iteration_seconds=st.sampled_from([1.0, 10.0, 60.0]),
)
def test_host_budgets_matches_python_twin_random(spark, rows, iteration_seconds):
    """Per-host budget on random robots rows where several rules per host
    disagree: the max declared delay governs; a host whose governing delay
    is zero, junk-negative, or small enough to overflow the budget is
    UNthrottled (int32 max), never booked the minimum; a host with only
    NULL delays (no Crawl-delay directive) inherits the parser's 1 s
    default — "no directive" is default pacing, not unthrottled. Twin is
    the literal per-host max + floor with the same saturation."""
    import math

    from crawler_service_spark.operators.robots import DEFAULT_DELAY_S

    df = spark.createDataFrame(
        [(h, "", True, d) for h, d in rows],
        "host string, path_prefix string, allow boolean, crawl_delay_s double",
    )

    expect = {}
    for h in {h for h, _ in rows}:
        ds = [d for hh, d in rows if hh == h and d is not None]
        d = max(ds) if ds else DEFAULT_DELAY_S
        if d <= 0:
            expect[h] = 2147483647
        else:
            expect[h] = min(max(1, math.floor(iteration_seconds / d)), 2147483647)

    got = {
        r["host"]: r["host_budget"]
        for r in politeness.host_budgets(df, iteration_seconds).collect()
    }
    assert got == expect
