"""Bucketed-layout co-located joins: the join of two same-bucketed tables
must run with ZERO Exchange (shuffle) operators, and results must equal the
plain shuffled join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_service_spark.plans.bucketing import plan_string, read_bucketed, write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    left = spark.range(10_000).select(
        F.col("id").alias("url_hash"), (F.col("id") % 7).alias("depth")
    )
    right = spark.range(0, 10_000, 3).select(
        F.col("id").alias("url_hash"), F.md5(F.col("id").cast("string")).alias("meta")
    )
    write_bucketed(left, "b_left", "url_hash", 8, path=str(tmp_path / "l"))
    write_bucketed(right, "b_right", "url_hash", 8, path=str(tmp_path / "r"))

    joined = read_bucketed(spark, "b_left").join(read_bucketed(spark, "b_right"), "url_hash")
    plan = plan_string(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan}"

    # same join through raw path reads (bucket layout forgotten) DOES shuffle
    raw = spark.read.parquet(str(tmp_path / "l")).join(
        spark.read.parquet(str(tmp_path / "r")), "url_hash"
    )
    assert "Exchange" in plan_string(raw), "path read must lose the layout (control)"

    # correctness: equals the plain shuffled join
    got = sorted(tuple(r) for r in joined.collect())
    want = sorted(tuple(r) for r in raw.select(joined.columns).collect())
    assert got == want and len(got) == len(range(0, 10_000, 3))

    spark.sql("DROP TABLE IF EXISTS b_left")
    spark.sql("DROP TABLE IF EXISTS b_right")


def test_bucketed_groupby_skips_exchange(spark, tmp_path, no_broadcast):
    df = spark.range(5_000).select(
        (F.col("id") % 997).alias("url_hash"), F.col("id").alias("v")
    )
    write_bucketed(df, "b_agg", "url_hash", 8, path=str(tmp_path / "a"))
    agg = read_bucketed(spark, "b_agg").groupBy("url_hash").agg(F.sum("v").alias("s"))
    plan = plan_string(agg)
    assert "Exchange" not in plan, f"groupBy on the bucket key must not shuffle:\n{plan}"
    assert agg.count() == 997
    spark.sql("DROP TABLE IF EXISTS b_agg")


def test_bucketed_corpus_exact_dedup_no_exchange(spark, tmp_path, no_broadcast):
    """A corpus bucketed on a precomputed text_hash dedupes with ZERO
    Exchange (the standing-key shuffle was paid once at write), and the
    result equals the plain md5-grouping path over the same rows."""
    from crawler_service_spark.operators import docdedup

    docs = spark.range(2_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc text "), (F.col("id") % 700).cast("string")).alias("text"),
    ).withColumn("text_hash", F.md5("text"))
    write_bucketed(docs, "b_corpus", "text_hash", 8, path=str(tmp_path / "c"))

    fast = docdedup.exact_dedup(read_bucketed(spark, "b_corpus"), hash_col="text_hash")
    plan = plan_string(fast)
    assert "Exchange" not in plan, f"bucketed dedup must not shuffle:\n{plan}"

    plain = docdedup.exact_dedup(docs)
    got = sorted(tuple(r) for r in fast.collect())
    want = sorted(tuple(r) for r in plain.collect())
    assert got == want and len(got) == 700
    spark.sql("DROP TABLE IF EXISTS b_corpus")
