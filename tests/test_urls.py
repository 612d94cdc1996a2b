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


def test_extract_text_three_way_byte_equality(spark):
    """Pandas-UDF extractor, JVM regexp twin, and the pure-Python oracle twin
    must produce byte-identical text (the north-rule per-row invariant)."""
    from pyspark.sql import functions as F

    from crawler_service_spark.operators.extraction import (
        extract_text,
        extract_text_col,
        extract_text_py,
    )

    htmls = [
        b"<html><title>T1</title><p>first</p><p>second</p></html>",
        b"<html><p>no title</p></html>",
        b"<html><title>only title</title></html>",
        b"<html>nothing</html>",
        b"<title>a\nb</title><p>x</p>",   # dot must not cross newlines
        "<title>unicode \xe9è</title><p>ok</p>".encode(),
        b"",
    ]
    df = spark.createDataFrame([(h,) for h in htmls], "html binary").repartition(2)
    rows = df.select(
        extract_text(F.col("html")).alias("udf"),
        extract_text_col("html").alias("jvm"),
        "html",
    ).collect()
    for r in rows:
        want = extract_text_py(bytes(r["html"]))
        assert r["udf"] == want and r["jvm"] == want, (r, want)
