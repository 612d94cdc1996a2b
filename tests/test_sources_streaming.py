"""Sources + streaming coverage:
- the pages scan actually prunes columns and pushes predicates (SURVEY §4.2);
- the streaming seed ingest drains available files exactly once (S1/T1);
- connected components (J6 full form) on known graphs.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from crawler_service_spark.operators.graph import connected_components
from crawler_service_spark.sources import read_pages, scan_report
from crawler_service_spark.streaming import ingest_seed_stream, read_seed_sink


def test_scan_prunes_and_pushes(spark, small_fixture):
    df = read_pages(spark, small_fixture["pages"], columns=["url", "lang"], lang="en")
    rep = scan_report(df)
    # projection reached the reader: html/text are NOT read
    assert "url" in rep["read_schema"] and "lang" in rep["read_schema"]
    assert "html" not in rep["read_schema"] and "text" not in rep["read_schema"]
    # the lang predicate reached the parquet scan
    assert "lang" in rep["pushed_filters"]


def test_streaming_seed_ingest_exactly_once(spark, tmp_path):
    seed_dir, ckpt, sink = str(tmp_path / "in"), str(tmp_path / "ckpt"), str(tmp_path / "out")
    os.makedirs(seed_dir)
    robots = spark.createDataFrame(
        [("x.com", "", True, 1.0), ("x.com", "/blocked", False, 1.0)],
        "host string, path_prefix string, allow boolean, crawl_delay_s double",
    )

    batch1 = spark.createDataFrame(
        [("c1", "https://x.com/a/", 0), ("c1", "https://x.com/a", 1),  # canonical dupes
         ("c1", "https://x.com/blocked/z", 2)],
        "crawl_id string, url string, seed_order long",
    )
    batch1.coalesce(1).write.mode("append").parquet(seed_dir)
    ingest_seed_stream(spark, seed_dir, robots, ckpt, sink)
    out1 = read_seed_sink(spark, sink)
    assert [r["url"] for r in out1.collect()] == ["https://x.com/a"]
    assert out1.collect()[0]["seed_order"] == 0  # earliest dupe wins

    # second drain with one NEW file: old files are not re-ingested
    spark.createDataFrame(
        [("c1", "https://x.com/b", 3)], "crawl_id string, url string, seed_order long"
    ).coalesce(1).write.mode("append").parquet(seed_dir)
    ingest_seed_stream(spark, seed_dir, robots, ckpt, sink)
    urls = sorted(r["url"] for r in read_seed_sink(spark, sink).collect())
    assert urls == ["https://x.com/a", "https://x.com/b"]


def test_connected_components_star_and_chain(spark):
    # two components: a star {0..4} hub=0, and a chain 10-11-12
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4), (10, 11), (11, 12)], "src long, dst long"
    )
    got = {
        r["node"]: r["component"] for r in connected_components(edges).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 10: 10, 11: 10, 12: 10}


def test_connected_components_merges_bridged_stars(spark):
    # two stars bridged by one edge -> single component labeled by min id
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (5, 6), (5, 7), (2, 6)], "src long, dst long"
    )
    comps = {r["component"] for r in connected_components(edges).collect()}
    assert comps == {0}


def test_stateful_budget_gate_across_microbatches(spark, tmp_path):
    """The per-host budget must hold ACROSS micro-batches and separate runs:
    state lives in the streaming checkpoint, not in memory (reference keeps
    this counter in its worker loop; Structured Streaming keeps it in the
    state store)."""
    from crawler_service_spark.streaming import budget_gate_stream, read_gated_sink

    seed_dir = str(tmp_path / "seeds")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(seed_dir)

    def drop(rows):
        spark.createDataFrame(
            rows, "crawl_id string, url string, seed_order long"
        ).coalesce(1).write.mode("append").parquet(seed_dir)

    # batch 1: host a gets 2 of its 3-budget; host b gets 1
    drop([("c", "https://a.com/1", 0), ("c", "https://a.com/2", 1), ("c", "https://b.com/1", 2)])
    budget_gate_stream(spark, seed_dir, sink, ckpt, budget_per_host=3)
    out1 = read_gated_sink(spark, sink)
    assert out1.count() == 3

    # batch 2 (separate run = restart): host a offers 3 more but only 1 slot
    # remains; host b takes 2 more
    drop([
        ("c", "https://a.com/3", 3), ("c", "https://a.com/4", 4),
        ("c", "https://a.com/5", 5), ("c", "https://b.com/2", 6),
        ("c", "https://b.com/3", 7),
    ])
    budget_gate_stream(spark, seed_dir, sink, ckpt, budget_per_host=3)
    rows = read_gated_sink(spark, sink).collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r["url"])
    assert len(by_host["a.com"]) == 3 and len(by_host["b.com"]) == 3
    # budget admits in seed_order: a.com/3 is the one admitted from batch 2
    assert sorted(by_host["a.com"]) == ["https://a.com/1", "https://a.com/2", "https://a.com/3"]


def test_windowed_metrics_watermark_late_data(spark, tmp_path):
    """Event-time windows with a watermark: in-order and tolerably-late
    events land in their window; a window emits exactly once (append mode)
    after the watermark passes; too-late events are dropped."""
    from datetime import datetime

    from crawler_service_spark.streaming import run_windowed_metrics_stream

    ev_dir = str(tmp_path / "events")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(ev_dir)
    t = lambda m, s=0: datetime(2026, 1, 1, 10, m, s)
    schema = "host string, url string, fetched_at timestamp, bytes long, ok boolean"

    def drop(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(ev_dir)

    # batch 1: two windows of events for host a + an out-of-order event
    drop([
        ("a", "u1", t(0, 10), 100, True),
        ("a", "u2", t(0, 50), 200, True),
        ("a", "u3", t(1, 10), 300, False),
        ("a", "u0", t(0, 30), 50, True),   # out of order, same window
        ("b", "u4", t(5, 0), 10, True),    # advances the watermark to 10:03
    ])
    run_windowed_metrics_stream(spark, ev_dir, sink, ckpt)
    out1 = {(r["window_start"].minute, r["host"]): r for r in spark.read.parquet(sink).collect()}
    # watermark = max(10:05) - 2min = 10:03 -> windows [10:00) and [10:01) closed
    assert out1[(0, "a")]["n_fetches"] == 3 and out1[(0, "a")]["bytes"] == 350
    assert out1[(1, "a")]["n_fetches"] == 1 and out1[(1, "a")]["n_ok"] == 0
    assert (5, "b") not in out1  # b's window not closed yet

    # batch 2: an event LATER than the watermark for the closed 10:00 window
    # is dropped; a fresh event far ahead closes b's window
    drop([
        ("a", "u9", t(0, 40), 999, True),   # too late -> dropped
        ("b", "u5", t(9, 0), 20, True),     # watermark -> 10:07, closes 10:05
    ])
    run_windowed_metrics_stream(spark, ev_dir, sink, ckpt)
    out2 = {(r["window_start"].minute, r["host"]): r for r in spark.read.parquet(sink).collect()}
    assert out2[(0, "a")]["n_fetches"] == 3, "closed window must not change"
    assert out2[(5, "b")]["n_fetches"] == 1


def test_streaming_dedup_first_occurrence_across_runs(spark, tmp_path):
    """Cross-micro-batch exact dedup: a content hash admitted in batch 1 must
    never re-emit in later batches or after a restart (state lives in the
    checkpointed state store); within a batch the min-doc_id row wins."""
    from crawler_service_spark.streaming import dedup_stream, read_deduped

    in_dir = str(tmp_path / "docs")
    sink = str(tmp_path / "dsink")
    ckpt = str(tmp_path / "dckpt")
    os.makedirs(in_dir)

    def drop(rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    # batch 1: two copies of A (doc 5 and 3 -> 3 wins), one B
    drop([(5, "text A"), (3, "text A"), (7, "text B")])
    dedup_stream(spark, in_dir, sink, ckpt)
    out1 = {(r["doc_id"]) for r in read_deduped(spark, sink).collect()}
    assert out1 == {3, 7}

    # batch 2 (separate run = restart): A again (suppressed by state), C new
    drop([(9, "text A"), (2, "text C")])
    dedup_stream(spark, in_dir, sink, ckpt)
    rows = read_deduped(spark, sink).collect()
    assert {r["doc_id"] for r in rows} == {3, 7, 2}
    assert len(rows) == 3  # exactly-once: no duplicate emissions


def test_streaming_corpus_ingest_gate_scrub_dedup(spark, tmp_path):
    """Quality gate -> PII scrub -> cross-batch dedup as one stream: short
    docs never reach the sink, emitted text is redacted with counts, dedup
    keys on the REDACTED text (PII-only variants collapse), and a suppressed
    hash stays suppressed across a restart."""
    import hashlib

    from crawler_service_spark.streaming import corpus_ingest_stream, read_corpus

    in_dir = str(tmp_path / "cdocs")
    sink = str(tmp_path / "csink")
    ckpt = str(tmp_path / "cckpt")
    os.makedirs(in_dir)

    def drop(rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    base = (
        "the quick brown fox and the lazy dog of the farm ran to a barn "
        "near the river and the miller took a sack of grain to the market "
        "while the sun rose over the quiet hills and a cold wind moved "
        "through the tall dry grass beside the old stone wall of the keep"
    )  # 56 words, passes every gopher gate
    doc_a = base + " mail bob@example.com"
    doc_a_variant = base + " mail sue@other.net"   # same text after redaction
    scrubbed_a = base + " mail <EMAIL>"

    # batch 1: quality doc with PII (doc 5), its PII-variant twin (doc 9,
    # must collapse onto the same redacted hash; 5 wins as min id), a
    # too-short doc (gate drops it before dedup)
    drop([(5, doc_a), (9, doc_a_variant), (7, "too short to pass")])
    corpus_ingest_stream(spark, in_dir, sink, ckpt)
    rows = {r["doc_id"]: r for r in read_corpus(spark, sink).collect()}
    assert set(rows) == {5}
    assert rows[5]["text"] == scrubbed_a
    assert rows[5]["n_emails"] == 1 and rows[5]["n_ips"] == 0
    assert rows[5]["text_hash"] == hashlib.md5(scrubbed_a.encode()).hexdigest()

    # batch 2 (separate run = restart): the scrubbed-identical doc again
    # (suppressed by state store), plus a new quality doc with an ip+phone
    doc_b = base + " host 10.0.0.9 call +1 555-0101"
    drop([(11, doc_a), (4, doc_b)])
    corpus_ingest_stream(spark, in_dir, sink, ckpt)
    rows = {r["doc_id"]: r for r in read_corpus(spark, sink).collect()}
    assert set(rows) == {5, 4}
    assert rows[4]["text"] == base + " host <IP> call <PHONE>"
    assert (rows[4]["n_ips"], rows[4]["n_phones"]) == (1, 1)

    # idempotent re-run: nothing new to process, nothing re-emitted
    corpus_ingest_stream(spark, in_dir, sink, ckpt)
    assert read_corpus(spark, sink).count() == 2


def test_streaming_sessionization_gap_merge_and_close(spark, tmp_path):
    """Native session_window: events within the gap merge into one session,
    a gap splits, and a session only emits once the watermark passes its
    possible extension; merged-session end = last event + gap."""
    from datetime import datetime

    from crawler_service_spark.streaming import run_session_stream

    ev_dir = str(tmp_path / "sev")
    sink = str(tmp_path / "ssink")
    ckpt = str(tmp_path / "sckpt")
    os.makedirs(ev_dir)
    t = lambda h, m=0: datetime(2026, 1, 1, h, m)

    def drop(rows):
        spark.createDataFrame(
            rows, "user_id long, event_id long, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(ev_dir)

    # user 1: events at 10:00/10:10/10:25 (one session, 10-15m gaps < 30m),
    # then 12:00 (new session). The 20:00 event pushes the watermark far
    # ahead (19:00) so everything before closes.
    drop([
        (1, 1, t(10, 0)), (1, 2, t(10, 10)), (1, 3, t(10, 25)),
        (1, 4, t(12, 0)),
        (2, 9, t(20, 0)),
    ])
    run_session_stream(spark, ev_dir, sink, ckpt, gap="30 minutes", watermark="1 hour")
    rows = {
        (r["user_id"], r["session_start"].hour, r["session_start"].minute): r
        for r in spark.read.parquet(sink).collect()
    }
    assert (1, 10, 0) in rows and rows[(1, 10, 0)]["n_events"] == 3
    assert rows[(1, 10, 0)]["session_end"] == t(10, 55), "end = last event + gap"
    assert (1, 12, 0) in rows and rows[(1, 12, 0)]["n_events"] == 1
    assert (2, 20, 0) not in rows, "user 2's session is still open"

    # restart: user 2's open session extends within the gap, then a far
    # event closes it; the already-emitted sessions must not re-emit
    drop([(2, 10, t(20, 20)), (2, 11, t(23, 0))])
    run_session_stream(spark, ev_dir, sink, ckpt, gap="30 minutes", watermark="1 hour")
    rows2 = spark.read.parquet(sink).collect()
    u2 = [r for r in rows2 if r["user_id"] == 2 and r["session_start"] == t(20, 0)]
    assert len(u2) == 1 and u2[0]["n_events"] == 2, "extended across restart, emitted once"
    assert len([r for r in rows2 if r["user_id"] == 1]) == 2, "no duplicate emissions"


def test_streaming_neardup_rolling_index(spark, tmp_path):
    """Rolling minhash-index dedup: a later batch's near-dup of an ALREADY
    ADMITTED doc is flagged and kept out of the index; unrelated docs are
    admitted; the index accumulates across separate runs (restarts)."""
    from crawler_service_spark.streaming import neardup_stream, read_dups, read_index_docs

    in_dir = str(tmp_path / "nd_docs")
    idx = str(tmp_path / "nd_index")
    dups = str(tmp_path / "nd_dups")
    ckpt = str(tmp_path / "nd_ckpt")
    os.makedirs(in_dir)
    base = "the quick brown fox jumps over the lazy dog near the river bank today"

    def drop(rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    # batch 1: two distinct docs + an INTRA-batch near-dup of doc 1
    drop([
        (1, base),
        (2, "completely different text about spark shuffle joins and windows"),
        (3, base + " word"),
    ])
    neardup_stream(spark, in_dir, idx, dups, ckpt)
    d1 = {(r["doc_id"], r["dup_of"]) for r in read_dups(spark, dups).collect()}
    assert d1 == {(3, 1)}, f"intra-batch near-dup must flag, got {d1}"
    assert {r["doc_id"] for r in read_index_docs(spark, idx).collect()} == {1, 2}

    # batch 2 (separate run = restart): near-dup of doc 1 + a fresh doc
    drop([(10, base + " extra"), (11, "yet another unrelated document body entirely")])
    neardup_stream(spark, in_dir, idx, dups, ckpt)
    d = {(r["doc_id"], r["dup_of"]) for r in read_dups(spark, dups).collect()}
    assert d == {(3, 1), (10, 1)}, f"near-dup of admitted doc must flag, got {d}"
    assert {r["doc_id"] for r in read_index_docs(spark, idx).collect()} == {1, 2, 11}

    # batch 3: near-dup of batch-2's ADMITTED doc 11 (not the flagged 10)
    drop([(20, "yet another unrelated document body entirely ok")])
    neardup_stream(spark, in_dir, idx, dups, ckpt)
    d3 = {(r["doc_id"], r["dup_of"]) for r in read_dups(spark, dups).collect()}
    assert (20, 11) in d3 and len(d3) == 3
    assert {r["doc_id"] for r in read_index_docs(spark, idx).collect()} == {1, 2, 11}


def test_streaming_neardup_index_compaction(spark, tmp_path):
    """Offline compaction folds the per-batch index append commits into one
    catalog overwrite commit without changing the index contents or future
    dedup decisions, and is idempotent; pre-compaction ``upto=`` snapshot
    reads still replay the original chain."""
    from crawler_service_spark.storage.catalog import ManifestCatalog
    from crawler_service_spark.streaming import (
        compact_index, neardup_stream, read_dups, read_index_docs,
    )

    in_dir = str(tmp_path / "c_docs")
    idx = str(tmp_path / "c_index")
    dups = str(tmp_path / "c_dups")
    ckpt = str(tmp_path / "c_ckpt")
    os.makedirs(in_dir)

    def drop(rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    drop([(1, "alpha beta gamma delta epsilon zeta eta theta")])
    neardup_stream(spark, in_dir, idx, dups, ckpt)
    drop([(2, "one two three four five six seven eight nine")])
    neardup_stream(spark, in_dir, idx, dups, ckpt)

    # mid-stream time travel: the index exactly as of batch 0's admission
    assert {r["doc_id"] for r in read_index_docs(spark, idx, upto="batch-0").collect()} == {1}

    before = sorted(tuple(r) for r in read_index_docs(spark, idx).collect())
    assert compact_index(spark, idx, ckpt) > 0
    assert sorted(tuple(r) for r in read_index_docs(spark, idx).collect()) == before
    cat = ManifestCatalog(idx, spark)
    assert len(cat._active_dirs("docs")) == 1, "snapshot reads one folded commit"
    assert compact_index(spark, idx, ckpt) == 0, "idempotent: nothing left to fold"
    # snapshot isolation survives compaction: the old chain still replays
    assert {r["doc_id"] for r in read_index_docs(spark, idx, upto="batch-0").collect()} == {1}

    # dedup against the compacted index still works
    drop([(9, "one two three four five six seven eight nine ok")])
    neardup_stream(spark, in_dir, idx, dups, ckpt)
    d = {(r["doc_id"], r["dup_of"]) for r in read_dups(spark, dups).collect()}
    assert (9, 2) in d
    # an append AFTER a compaction folds with the overwrite itself (the
    # active count includes the overwrite's data dir): 2 dirs per table
    assert compact_index(spark, idx, ckpt) == 4
    assert sorted(tuple(r) for r in read_index_docs(spark, idx).collect()) == before


def test_streaming_neardup_compaction_guard(spark, tmp_path):
    """compact_index refuses to fold while the stream checkpoint holds a
    planned-but-uncommitted (replayable) batch — folding then would defeat
    the replay's own-commit exclusion and self-dup every doc in the batch."""
    import pytest

    from crawler_service_spark.streaming import compact_index, neardup_stream

    in_dir = str(tmp_path / "g_docs")
    idx = str(tmp_path / "g_index")
    dups = str(tmp_path / "g_dups")
    ckpt = str(tmp_path / "g_ckpt")
    os.makedirs(in_dir)
    for b, text in enumerate(
        ["alpha beta gamma delta epsilon zeta", "one two three four five six"]
    ):
        spark.createDataFrame([(b, text)], "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(in_dir)
        neardup_stream(spark, in_dir, idx, dups, ckpt)

    # simulate a crash after offset planning but before the commit record:
    # offsets log one batch ahead of commits log
    offsets = sorted(int(f) for f in os.listdir(os.path.join(ckpt, "offsets")) if f.isdigit())
    nxt = offsets[-1] + 1
    with open(os.path.join(ckpt, "offsets", str(nxt)), "w") as f:
        f.write("v1\n{}\n0")
    with pytest.raises(RuntimeError, match="uncommitted batch"):
        compact_index(spark, idx, ckpt)
    os.remove(os.path.join(ckpt, "offsets", str(nxt)))

    # a typo'd / nonexistent checkpoint path must not silently pass the guard
    with pytest.raises(ValueError, match="not a streaming checkpoint"):
        compact_index(spark, idx, str(tmp_path / "no_such_ckpt"))

    assert compact_index(spark, idx, ckpt) > 0, "quiesced checkpoint folds fine"


def test_streaming_neardup_midstream_snapshot(spark, tmp_path):
    """The time-travel contract of the catalog-backed near-dup index
    (neardup.py module docstring: ``upto=`` snapshot reads work mid-stream):
    the index read at ``batch-k`` equals the EXACT full-frame post-batch-k
    state after the stream has advanced n more batches — for the docs table
    AND the buckets table — and stays correct even while a further batch is
    half-landed (crashed between its two index commits), which is precisely
    the mid-stream state a concurrent reader can observe."""
    from crawler_service_spark.storage.catalog import ManifestCatalog
    from crawler_service_spark.streaming import neardup_stream, read_index_docs
    from crawler_service_spark.streaming.neardup import DOC_SCHEMA, _EMPTY_BUCKETS

    in_dir = str(tmp_path / "s_docs")
    idx = str(tmp_path / "s_index")
    dups = str(tmp_path / "s_dups")
    ckpt = str(tmp_path / "s_ckpt")
    os.makedirs(in_dir)
    base = "the quick brown fox jumps over the lazy dog near the river bank today"

    def drop(rows):
        spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    def full_docs(upto=None):
        return sorted(
            tuple(r) for r in read_index_docs(spark, idx, upto=upto).collect()
        )

    # batch 0 admits docs 1 and 2
    drop([(1, base), (2, "completely different text about spark shuffle joins")])
    neardup_stream(spark, in_dir, idx, dups, ckpt)
    post_k = full_docs()
    assert {t[0] for t in post_k} == {1, 2}

    # advance the stream n=2 batches (batch 1 flags a near-dup of doc 1,
    # admits 11; batch 2 admits 20) — the standing index keeps changing
    drop([(10, base + " extra"), (11, "yet another unrelated document body")])
    neardup_stream(spark, in_dir, idx, dups, ckpt)
    post_k1 = full_docs()
    drop([(20, "fresh corpus page about window functions and watermarks")])
    neardup_stream(spark, in_dir, idx, dups, ckpt)
    assert {t[0] for t in full_docs()} == {1, 2, 11, 20}

    # snapshot at batch-k must equal the state recorded right after batch k
    # (full frames — ids AND text — not just id sets), for every k behind HEAD
    assert full_docs(upto="batch-0") == post_k
    assert full_docs(upto="batch-1") == post_k1

    # the buckets table time-travels consistently with docs: the batch-0
    # bucket set covers exactly the docs batch 0 admitted
    cat = ManifestCatalog(idx, spark)
    b0 = cat.read("buckets", upto="batch-0", schema=_EMPTY_BUCKETS)
    assert {r["doc_id"] for r in b0.select("doc_id").distinct().collect()} == {1, 2}

    # half-landed batch 3: its docs commit landed, its buckets commit never
    # did (crash between the two) — the exact state a mid-stream reader can
    # catch. Earlier snapshots must be untouched, and the replay protection
    # (exclude_commit, what handle_batch itself reads with) must restore the
    # pre-batch-3 frame.
    cat.commit(
        "docs",
        spark.createDataFrame([(99, "phantom half landed doc")], DOC_SCHEMA),
        "batch-3",
    )
    assert full_docs(upto="batch-0") == post_k
    assert full_docs(upto="batch-1") == post_k1
    cur = {r["doc_id"] for r in cat.read("docs", schema=DOC_SCHEMA).collect()}
    assert 99 in cur, "HEAD sees the half-landed commit"
    excl = {
        r["doc_id"]
        for r in cat.read("docs", exclude_commit="batch-3", schema=DOC_SCHEMA).collect()
    }
    assert excl == {1, 2, 11, 20}, "replay's own-commit exclusion restores pre-batch state"

    # the stream itself recovers over the half-landed commit: re-running the
    # batch under the same commit id is a no-op for docs and lands buckets
    drop([(99, "phantom half landed doc")])
    neardup_stream(spark, in_dir, idx, dups, ckpt)
    assert {t[0] for t in full_docs()} == {1, 2, 11, 20, 99}
    b_now = cat.read("buckets", schema=_EMPTY_BUCKETS)
    assert {r["doc_id"] for r in b_now.select("doc_id").distinct().collect()} == {
        1, 2, 11, 20, 99
    }


def test_streaming_neardup_rejects_legacy_layout(spark, tmp_path):
    """A pre-catalog index (bare batch-* subdirs, no manifests) must error
    loudly instead of silently deduping against an empty index."""
    import pytest

    from crawler_service_spark.streaming import neardup_stream

    idx = str(tmp_path / "legacy_index")
    os.makedirs(os.path.join(idx, "docs", "batch-0"))
    in_dir = str(tmp_path / "l_docs")
    os.makedirs(in_dir)
    spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string").write.parquet(
        in_dir, mode="overwrite"
    )
    with pytest.raises(RuntimeError, match="legacy"):
        neardup_stream(
            spark, in_dir, idx, str(tmp_path / "l_dups"), str(tmp_path / "l_ckpt")
        )
