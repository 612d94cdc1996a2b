"""Determinism under different parallelism: the crawl's full output state is
identical regardless of partition count (SURVEY.md §7 watch-list item
"deterministic ordering under parallelism").

Core-count scaling (local[8] vs local[32]) is evidenced by bench.py — a Spark
session's master is fixed per JVM, so here we vary the other parallelism axis,
``spark.sql.shuffle.partitions``, which changes every shuffle's partitioning
(and thus task interleaving) between the two runs.
"""

from __future__ import annotations

from crawler_service_spark.engine import CrawlConfig, CrawlEngine
from tests.conftest import engine_snapshot

ITER_S = 4.0


def run_with_partitions(spark, fixture, wd, n_parts: int):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    try:
        eng = CrawlEngine(
            spark,
            pages=spark.read.parquet(fixture["pages"]),
            robots=spark.read.parquet(fixture["robots_rules"]),
            workdir=str(wd),
            config=CrawlConfig(iteration_seconds=ITER_S, max_iterations=200),
        )
        stats = eng.run(seeds=spark.read.parquet(fixture["seeds"]))
        assert stats[-1]["status"] == "complete"
        return engine_snapshot(eng)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_crawl_state_invariant_across_partitioning(
    spark, tiny_fixture, tmp_path_factory
):
    snap3 = run_with_partitions(
        spark, tiny_fixture, tmp_path_factory.mktemp("wd-p3"), 3
    )
    snap13 = run_with_partitions(
        spark, tiny_fixture, tmp_path_factory.mktemp("wd-p13"), 13
    )
    assert snap3 == snap13
    assert snap3["state"][1] == "complete"
