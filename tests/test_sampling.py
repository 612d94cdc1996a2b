"""Deterministic hash-sampling semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_service_spark.operators import sampling


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_sample_is_partition_invariant_and_nested(spark):
    base = spark.range(2000).select(F.col("id").alias("doc_id"))
    a = _ids(sampling.deterministic_sample(base.repartition(1), 200))
    b = _ids(sampling.deterministic_sample(base.repartition(17), 200))
    assert a == b, "membership must be a pure function of the key"
    small = _ids(sampling.deterministic_sample(base, 100))
    assert small <= a, "lower rate must nest inside higher rate (same salt)"
    # roughly proportional (hash uniformity; wide tolerance, deterministic)
    assert 300 <= len(a) <= 500 and 140 <= len(small) <= 260  # ~400 / ~200
    redraw = _ids(sampling.deterministic_sample(base, 200, salt="other"))
    assert redraw != a, "salt change must redraw"


def test_stratified_rates_and_default(spark):
    rows = [(i, ["en", "de", "xx"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.stratified_sample(
        df, {"en": 1000, "de": 0}, strata_col="lang", default_permille=500
    )
    got = out.groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in got}
    assert counts["en"] == 1000, "rate 1000 keeps every row"
    assert "de" not in counts, "rate 0 keeps none"
    assert 350 <= counts["xx"] <= 650, "unlisted stratum uses the default rate"
