"""Engine-integrated trap guard: the cumulative (host, template) census must
quarantine an exploding host without touching healthy hosts, deterministically
across runs (flags read iteration-pinned state)."""

from __future__ import annotations

import datetime as dt

from crawler_service_spark.engine import CrawlConfig, CrawlEngine

N_DATES = 36
FANOUT = 3
TS = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _date_url(i: int) -> str:
    return f"http://cal.com/d/2020/03/{i:02d}"


def _pages():
    """cal.com: /start fans into a closed 36-date calendar (one template,
    every date links FANOUT more — the bounded stand-in for an unbounded
    trap). ok.com: 4 pages, distinct templates, links close on themselves."""
    pages = {}
    pages["http://cal.com/start"] = [_date_url(i) for i in range(FANOUT)]
    for i in range(N_DATES):
        pages[_date_url(i)] = [
            _date_url((FANOUT * i + 1 + j) % N_DATES) for j in range(FANOUT)
        ]
    ok = ["http://ok.com/home", "http://ok.com/about",
          "http://ok.com/contact", "http://ok.com/docs"]
    pages[ok[0]] = ok[1:]
    for leaf in ok[1:]:
        pages[leaf] = [ok[0]]
    return pages


def _dfs(spark):
    rows = [
        (u, TS, f'<html><title>{u}</title>{"".join(f"<a href=%c%s%c>x</a>" % (0x22, t, 0x22) for t in links)}<p>b</p></html>'.encode(),
         f"{u}\nb", "en")
        for u, links in _pages().items()
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    robots = spark.createDataFrame(
        [("cal.com", "", True, 1.0), ("ok.com", "", True, 1.0)],
        "host string, path_prefix string, allow boolean, crawl_delay_s double",
    )
    seeds = spark.createDataFrame(
        [("c1", "http://cal.com/start", 0), ("c1", "http://ok.com/home", 1)],
        "crawl_id string, url string, seed_order long",
    )
    return pages, robots, seeds


def _crawl(spark, tmp, name, **cfg_kwargs):
    pages, robots, seeds = _dfs(spark)
    eng = CrawlEngine(
        spark, pages, robots, str(tmp / name),
        CrawlConfig(iteration_seconds=6.0, max_iterations=60, **cfg_kwargs),
    )
    stats = eng.run(seeds=seeds)
    assert stats[-1]["status"] == "complete"
    seen = {r["url"] for r in eng.catalog.read("seen").select("url").collect()}
    return eng, seen


def test_trap_guard_quarantines_exploding_host_only(spark, tmp_path):
    guard_kwargs = dict(trap_guard=True, trap_min_urls=8, trap_ratio_permille=3000)
    _, open_seen = _crawl(spark, tmp_path, "open")
    eng, guarded_seen = _crawl(spark, tmp_path, "guarded", **guard_kwargs)

    # unguarded: the whole calendar is crawled
    assert {u for u in open_seen if "cal.com/d/" in u} == {
        _date_url(i) for i in range(N_DATES)
    }
    # guarded: a strict subset of the calendar, never a superset anywhere
    assert guarded_seen < open_seen
    n_open = sum(1 for u in open_seen if "cal.com/d/" in u)
    n_guarded = sum(1 for u in guarded_seen if "cal.com/d/" in u)
    assert n_guarded < n_open
    # the healthy host is untouched by the quarantine
    assert {u for u in guarded_seen if "ok.com" in u} == {
        u for u in open_seen if "ok.com" in u
    }
    # the census table carries the cumulative counts that tripped the flag
    from crawler_service_spark.operators import traps

    deltas = eng.catalog.read("trap_stats", schema=traps.TRAP_STATS_SCHEMA)
    flagged = {
        r["host"]
        for r in traps.flagged_hosts_from_deltas(deltas, 3000, 8).collect()
    }
    assert flagged == {"cal.com"}

    # determinism: an identical guarded run reproduces the exact seen set
    # (flags read iteration-pinned snapshots, so replay cannot diverge)
    _, again = _crawl(spark, tmp_path, "guarded2", **guard_kwargs)
    assert again == guarded_seen


def test_trap_guard_survives_kill_and_resume(spark, tmp_path):
    """The replay contract under an ACTUAL interruption: stop the guarded
    crawl after 2 iterations, resume with a brand-new engine over the same
    workdir, and the final seen set must equal the uninterrupted guarded
    run's — possible only because flags read trap_stats pinned to the
    previous iteration's commit, never the in-flight one."""
    guard_kwargs = dict(trap_guard=True, trap_min_urls=8, trap_ratio_permille=3000)
    _, full = _crawl(spark, tmp_path, "g-full", **guard_kwargs)

    pages, robots, seeds = _dfs(spark)
    cfg = CrawlConfig(iteration_seconds=6.0, max_iterations=60, **guard_kwargs)
    eng1 = CrawlEngine(spark, pages, robots, str(tmp_path / "g-stop"), cfg)
    stats1 = eng1.run(seeds=seeds, max_iterations=2)
    assert stats1[-1]["status"] == "running"
    eng2 = CrawlEngine(spark, pages, robots, str(tmp_path / "g-stop"), cfg)
    stats2 = eng2.resume()
    assert stats2[-1]["status"] == "complete"
    resumed = {r["url"] for r in eng2.catalog.read("seen").select("url").collect()}
    assert resumed == full


def test_trap_guard_default_thresholds_spare_small_sites(spark, tmp_path):
    """The engine's enforcement thresholds sit far above the census-report
    defaults: every legitimate site is template-driven, so quarantine only
    fires on hosts minting hundreds of URLs per pattern. At the defaults a
    small template-heavy site (this fixture's calendar included) crawls
    identically with the guard on — only the census table is maintained."""
    _, open_seen = _crawl(spark, tmp_path, "open-dflt")
    eng, guarded_seen = _crawl(spark, tmp_path, "guard-dflt", trap_guard=True)
    assert guarded_seen == open_seen
    assert eng.catalog.exists("trap_stats")


def _host_counts(eng):
    from pyspark.sql import functions as F

    from crawler_service_spark.operators import traps

    seen = {
        (r["host"], r["cnt"])
        for r in eng.catalog.read("seen")
        .groupBy("host").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    census = {
        (r["host"], r["cnt"])
        for r in eng.catalog.read("trap_stats", schema=traps.TRAP_STATS_SCHEMA)
        .groupBy("host").agg(F.sum("n").alias("cnt")).collect()
    }
    return seen, census


def test_census_is_additive_incl_seeds_and_forget_expiry(spark, tmp_path):
    """The additivity invariant: at every quiesced point, sum(trap_stats.n)
    per host equals the seen set's distinct-URL count per host — seeds are
    censused at iteration 0, and forget-expiry appends negative deltas for
    the urls it removes (so fully-forgotten templates stop counting)."""
    eng, _ = _crawl(spark, tmp_path, "inv", trap_guard=True)
    seen, census = _host_counts(eng)
    assert census == seen

    # forget half the calendar: census totals must follow the seen set
    forget = spark.createDataFrame(
        [(_date_url(i),) for i in range(0, N_DATES, 2)], "url string"
    )
    eng.expire(forget, mode="forget")
    seen2, census2 = _host_counts(eng)
    assert census2 == seen2
    assert census2 != census  # the decrement actually landed


def test_guard_survives_mid_iteration_crash_replay(spark, tmp_path):
    """The strict replay contract: crash BETWEEN iteration 3's data commits
    (trap_stats delta included) and its crawl_state checkpoint; the re-run
    of iteration 3 must read flags pinned to iteration 2 — ignoring the
    already-committed traps-iter-3 — and converge on the uninterrupted
    guarded crawl's exact seen set."""
    import os

    guard_kwargs = dict(trap_guard=True, trap_min_urls=8, trap_ratio_permille=3000)
    _, full = _crawl(spark, tmp_path, "mc-full", **guard_kwargs)

    pages, robots, seeds = _dfs(spark)
    cfg = CrawlConfig(iteration_seconds=6.0, max_iterations=60, **guard_kwargs)
    wd = tmp_path / "mc-crash"
    eng1 = CrawlEngine(spark, pages, robots, str(wd), cfg)
    eng1.run(seeds=seeds, max_iterations=3)
    mdir = os.path.join(str(wd), "crawl_state", "_manifests")
    victims = [m for m in os.listdir(mdir) if m.endswith("-state-iter-3.json")]
    assert victims
    for v in victims:
        os.remove(os.path.join(mdir, v))

    eng2 = CrawlEngine(spark, pages, robots, str(wd), cfg)
    assert int(eng2.last_state()["iteration"]) == 2
    stats = eng2.resume()
    assert stats[-1]["status"] == "complete"
    resumed = {r["url"] for r in eng2.catalog.read("seen").select("url").collect()}
    assert resumed == full


def test_trap_stats_compaction_bounds_the_chain(spark, tmp_path):
    """frontier_compact_ratio=0 compacts every iteration: the trap_stats
    chain folds into overwrite rollups (same commit-id convention) and the
    guarded crawl result is unchanged."""
    guard_kwargs = dict(trap_guard=True, trap_min_urls=8, trap_ratio_permille=3000)
    _, plain = _crawl(spark, tmp_path, "nc", **guard_kwargs)
    eng, compacted = _crawl(
        spark, tmp_path, "cc", frontier_compact_ratio=0.0, **guard_kwargs
    )
    assert compacted == plain
    modes = dict(eng.catalog.commit_modes("trap_stats"))
    assert "overwrite" in modes.values()
    seen, census = _host_counts(eng)
    assert census == seen
