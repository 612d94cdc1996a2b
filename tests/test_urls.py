"""Canonicalization contract: Spark columns == pure-Python twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_service_spark.functions.urls import (
    canonicalize_url_col,
    canonicalize_url_py,
    ext_class_col,
    extension_col,
    host_col,
    host_py,
    path_col,
    path_py,
)

CASES = [
    "http://Host00.Example/p/01/00000001.html",
    "  http://host01.example/a/b/  ",
    "http://host01.example:80/a",
    "https://host02.example:443/x/y.csv#frag",
    "https://host02.example:8443/x",
    "http://host03.example",
    "http://host03.example/",
    "http://host04.example/a//b///",
    "HTTP://HOST05.EXAMPLE/A/B.TXT#z",
    "relative/path.html",
    "http://host06.example/q.zip",
]


def test_canonicalize_spark_matches_python(spark):
    df = spark.createDataFrame([(u,) for u in CASES], "url string")
    got = [
        r[0]
        for r in df.select(canonicalize_url_col("url")).collect()
    ]
    want = [canonicalize_url_py(u) for u in CASES]
    assert got == want


def test_host_path_spark_matches_python(spark):
    canon = [canonicalize_url_py(u) for u in CASES if u.strip().lower().startswith("http")]
    df = spark.createDataFrame([(u,) for u in canon], "url string")
    rows = df.select(host_col("url").alias("h"), path_col("url").alias("p")).collect()
    assert [(r["h"], r["p"]) for r in rows] == [(host_py(u), path_py(u)) for u in canon]


def test_canonicalize_idempotent(spark):
    once = [canonicalize_url_py(u) for u in CASES]
    twice = [canonicalize_url_py(u) for u in once]
    assert once == twice


def test_extension_and_class(spark):
    df = spark.createDataFrame(
        [("http://h/a/b.TXT",), ("http://h/a/noext",), ("http://h/x.tar.GZ",), ("http://h/i.PNG",)],
        "url string",
    )
    rows = df.select(
        extension_col("url").alias("e"), ext_class_col(extension_col("url")).alias("c")
    ).collect()
    assert [(r["e"], r["c"]) for r in rows] == [
        ("txt", "text"), (None, "other"), ("gz", "compressed"), ("png", "images")
    ]


def test_host_path_schemeless_with_midstring_separator(spark):
    """A scheme-less string containing '://' mid-string must parse like the
    python twins: host '' and path = the whole string (seed()/ingest derive
    host/path without the crawl loop's rlike guard)."""
    weird = ["1http://a/b", "nota url ://x/y", "file.txt"]
    df = spark.createDataFrame([(u,) for u in weird], "url string")
    rows = df.select(host_col("url").alias("h"), path_col("url").alias("p")).collect()
    assert [(r["h"], r["p"]) for r in rows] == [(host_py(u), path_py(u)) for u in weird]
