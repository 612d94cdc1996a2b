"""Property tests: new text/session operators vs pure-Python references."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from crawler_service_spark.operators import sessions, textquality

WORDS = ["spark", "window", "merge", "data", "row", "x1", "x2"]


def _py_keyword_scores(docs, terms, k1=1200, b=750):
    """Pure-Python twin of textquality.keyword_topk's integer formula."""
    toks = {d: [w for w in t.lower().split() if w] for d, t in docs}
    n = len(docs)
    sum_dl = sum(len(v) for v in toks.values())
    avgdl = (1000 * sum_dl) // n
    out = {}
    for d, _ in docs:
        dl = len(toks[d])
        score = 0
        for term in terms:
            tf = toks[d].count(term)
            if tf == 0:
                continue
            df = sum(1 for dd, _ in docs if term in toks[dd])
            norm = (1000 - b) + (b * dl * 1000) // avgdl
            tf_part = (1000000 * tf * (1000 + k1)) // (1000 * tf + (k1 * norm) // 1000)
            idf_millis = (1000 * (n - df + 1)) // (df + 1)
            score += (tf_part * idf_millis) // 1000
        if score > 0:
            out[d] = score
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from(WORDS), min_size=1, max_size=12),
        min_size=2, max_size=8,
    )
)
def test_keyword_topk_matches_python_reference(spark, doc_words):
    docs = [(i, " ".join(ws)) for i, ws in enumerate(doc_words)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r["score_micros"]
        for r in textquality.keyword_topk(df, ["spark", "merge"], k=100).collect()
    }
    assert got == _py_keyword_scores(docs, ["spark", "merge"])


def _py_sessions(events, gap):
    """(user, session_id) -> [epochs]; sessions split on gap > ``gap``."""
    out = {}
    by_user = {}
    for u, _e, t in events:
        by_user.setdefault(u, []).append(t)
    for u, ts in by_user.items():
        sid = 0
        prev = None
        for t in sorted(ts):
            if prev is None or t - prev > gap:
                sid += 1
            out.setdefault((u, sid), []).append(t)
            prev = t
    return {
        k: (len(v), min(v), max(v), max(v) - min(v)) for k, v in out.items()
    }


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),
            st.integers(min_value=0, max_value=5000),
        ),
        min_size=1, max_size=30, unique=True,
    )
)
def test_session_rollup_matches_python_reference(spark, user_times):
    base = dt.datetime(2026, 1, 1)
    events = [
        (u, i, off) for i, (u, off) in enumerate(user_times)
    ]
    rows = [(u, e, base + dt.timedelta(seconds=off)) for u, e, off in events]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp_ntz")
    got = {
        (r["user_id"], r["session_id"]): (
            r["n_events"], r["start_epoch"], r["end_epoch"], r["duration_s"]
        )
        for r in sessions.session_rollup(df, gap_seconds=300).collect()
    }
    base_epoch = int(base.replace(tzinfo=dt.timezone.utc).timestamp())
    want = {
        k: (n, base_epoch + lo, base_epoch + hi, d)
        for k, (n, lo, hi, d) in _py_sessions(events, 300).items()
    }
    assert got == want
