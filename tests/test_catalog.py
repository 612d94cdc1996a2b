"""ManifestCatalog: concurrent same-table commit safety and compaction."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from crawler_service_spark.storage import ManifestCatalog


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_concurrent_commits_same_table_never_lose_one(spark, tmp_path):
    """The per-table lock makes manifest sequencing race-free: N threads
    committing distinct ids to ONE table must all land (the pre-lock race
    silently overwrote colliding manifest seqs)."""
    cat = ManifestCatalog(str(tmp_path / "wd"), spark)
    n = 12

    def commit(i: int) -> bool:
        df = spark.createDataFrame([(i, f"v{i}")], "k long, v string")
        return cat.commit("t", df, f"c-{i}")

    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(commit, range(n)))
    assert all(results)
    assert sorted(cat.commits("t")) == sorted(f"c-{i}" for i in range(n))
    assert cat.read("t").count() == n
    # idempotent re-commit is still a no-op
    assert not cat.commit("t", spark.createDataFrame([(0, "x")], "k long, v string"), "c-0")
    assert cat.read("t").count() == n


def test_compact_preserves_snapshot_and_time_travel(spark, tmp_path):
    cat = ManifestCatalog(str(tmp_path / "wd"), spark)
    for i in range(5):
        cat.commit(
            "t", spark.createDataFrame([(i,)], "k long"), f"c-{i}",
        )
    before = _rows(cat.read("t"))
    early = _rows(cat.read("t", upto="c-2"))
    assert cat.compact("t", "compact-1", files=1)
    assert _rows(cat.read("t")) == before
    # time travel to pre-compaction commits still replays the old chain
    assert _rows(cat.read("t", upto="c-2")) == early
    # appends after compaction stack on the compacted base
    cat.commit("t", spark.createDataFrame([(99,)], "k long"), "c-99")
    assert _rows(cat.read("t")) == sorted(before + [(99,)])
    # compacting an absent table is a no-op
    assert not cat.compact("missing", "x")
