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
