"""Incremental frontier commits: per-iteration write volume must scale with
the iteration batch (never the frontier), tombstone accounting must be exact,
compaction must be equivalence-preserving, and resume must work across the
delta/compact boundary."""

from __future__ import annotations

from conftest import engine_snapshot

from crawler_service_spark.engine import CrawlConfig, CrawlEngine
from crawler_service_spark.fixtures import FixtureSpec, generate_fixture


def _engine(spark, paths, wd, **cfg) -> CrawlEngine:
    return CrawlEngine(
        spark,
        spark.read.parquet(paths["pages"]),
        spark.read.parquet(paths["robots_rules"]),
        wd,
        CrawlConfig(iteration_seconds=20.0, **cfg),
    )


def test_delta_commits_scale_with_batch_not_frontier(spark, small_fixture, tmp_path):
    eng = _engine(spark, small_fixture, str(tmp_path / "wd"))
    stats = eng.run(seeds=spark.read.parquet(small_fixture["seeds"]))
    assert stats[-1]["status"] == "complete"

    compactions = 0
    for s in stats:
        k = s["iteration"]
        commit = eng.catalog.read_commit("frontier_pending", f"pending-iter-{k}")
        st = eng.catalog.read_commit("crawl_state", f"state-iter-{k}").collect()[0]
        if int(st["tombstones"]) == 0 and k > 1:
            compactions += 1
            # compaction iteration: the write is the materialized live set
            assert commit.count() == int(st["frontier_pending"])
        else:
            # delta iteration: the write is ONLY this iteration's new rows
            assert commit.count() == s["new_urls"], (
                f"iteration {k} wrote {commit.count()} rows, batch was {s['new_urls']}"
            )
        # tombstone commit is only this iteration's scheduled urls
        tomb = eng.catalog.read_commit("frontier_tombstones", f"tomb-iter-{k}")
        if int(st["tombstones"]) > 0:
            assert tomb.count() <= s["scheduled"]
    # the reconstructed view drains to exactly zero
    assert eng.read_pending(stats[-1]["iteration"]).count() == 0
    # BFS crawls shrink at the end, so garbage must eventually cross the
    # ratio: the compaction path is actually exercised
    assert compactions >= 1


def test_compaction_ratio_equivalence(spark, small_fixture, tmp_path):
    """ratio=0 (compact every iteration == round-1 full-rewrite behavior),
    ratio=1 (default), and never-compact must produce identical crawls."""
    snaps = []
    for name, ratio in [("always", 0.0), ("default", 1.0), ("never", 1e18)]:
        eng = _engine(
            spark, small_fixture, str(tmp_path / f"wd-{name}"),
            frontier_compact_ratio=ratio,
        )
        eng.run(seeds=spark.read.parquet(small_fixture["seeds"]))
        snaps.append(engine_snapshot(eng))
    assert snaps[0] == snaps[1] == snaps[2]


def test_resume_across_compaction_boundary(spark, tmp_path):
    """Kill the crawl right after a compacting iteration and resume: the final
    state must equal an uninterrupted run (snapshot reads + idempotent
    commits hold across the overwrite)."""
    paths = generate_fixture(
        FixtureSpec(n_pages=240, n_hosts=8, n_seeds=3, seed=11), str(tmp_path / "fix")
    )
    ref = _engine(spark, paths, str(tmp_path / "ref"), frontier_compact_ratio=0.25)
    ref.run(seeds=spark.read.parquet(paths["seeds"]))

    eng = _engine(spark, paths, str(tmp_path / "wd"), frontier_compact_ratio=0.25)
    eng.run(seeds=spark.read.parquet(paths["seeds"]), max_iterations=3)
    # fresh engine on the same workdir = process restart
    eng2 = _engine(spark, paths, str(tmp_path / "wd"), frontier_compact_ratio=0.25)
    eng2.resume()
    assert engine_snapshot(eng2) == engine_snapshot(ref)
