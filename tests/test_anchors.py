"""Anchor-text extraction + per-target rollup vs a pure-Python twin."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from crawler_service_spark.functions.urls import canonicalize_url_py
from crawler_service_spark.operators.extraction import (
    ANCHOR_PATTERN,
    anchor_text_topk,
    extract_anchor_links,
)

DOCS = [
    (
        "http://a.com/1",
        b'<html><a href="http://t.com/x">Docs</a> '
        b'<a href="http://t.com/x">docs</a> '
        b'<a href="http://t.com/x">  DOCS  here </a> '
        b'<a href="http://t.com/y"><b>bold-wrapped</b></a> '
        b'<a class="z" href="http://t.com/y">guide</a></html>',
    ),
    (
        "http://a.com/2",
        b'<html><a href="http://t.com/x">docs</a>'
        b'<a href="http://T.COM/x/">guide</a>'
        b'<a href="http://t.com/z">one\n two</a></html>',
    ),
    ("http://a.com/3", None),  # fetch miss: null html, contributes nothing
    (
        "http://a.com/4",
        # trailing-newline anchor must group with 'docs'; whitespace-only
        # anchor must drop; relative hrefs (same path on two hosts) must NOT
        # aggregate — resolution is the frontier's job, not the rollup's
        b'<html><a href="http://t.com/x">Docs\n</a>'
        b'<a href="http://t.com/z">\n</a>'
        b'<a href="/about">about us</a></html>',
    ),
    (
        "http://b.com/1",
        b'<html><a href="/about">about us</a></html>',
    ),
]


def _twin_links():
    out = []
    for url, html in DOCS:
        if html is None:
            continue
        for i, m in enumerate(re.finditer(ANCHOR_PATTERN, html.decode())):
            out.append((url, i, m.group(1), m.group(2)))
    return out


def _twin_topk(k):
    counts: dict[tuple[str, str], int] = {}
    for _u, _i, href, anchor in _twin_links():
        if not re.match(r"^\s*https?://", href, re.IGNORECASE):
            continue  # relative hrefs need per-page resolution, not grouping
        # ASCII-explicit class + strip(' ') to mirror the JVM exactly
        a = re.sub(r"[ \t\n\x0b\f\r]+", " ", anchor.lower()).strip(" ")
        if not a:
            continue
        key = (canonicalize_url_py(href), a)
        counts[key] = counts.get(key, 0) + 1
    out = []
    by_dst: dict[str, list] = {}
    for (dst, a), n in counts.items():
        by_dst.setdefault(dst, []).append((a, n))
    for dst, pairs in by_dst.items():
        pairs.sort(key=lambda p: (-p[1], p[0]))
        out.extend((dst, a, n, r + 1) for r, (a, n) in enumerate(pairs[:k]))
    return sorted(out)


def test_anchor_links_match_twin_in_document_order(spark):
    df = spark.createDataFrame(DOCS, "url string, html binary")
    got = sorted(
        (r["url"], r["link_idx"], r["href"], r["anchor"])
        for r in extract_anchor_links(df).collect()
    )
    assert got == sorted(_twin_links())
    # the bold-wrapped anchor captures '' (text starts with a tag) — present
    # in the link rows, dropped later by the rollup's empty filter
    assert ("http://a.com/1", 3, "http://t.com/y", "") in got


def test_anchor_topk_rollup_matches_twin(spark):
    """Case/whitespace variants of 'docs' collapse to one anchor; t.com/x
    and T.COM/x/ canonicalize to one target; ties break anchor-ascending;
    identical at any parallelism."""
    for parts in (2, 9):
        df = spark.createDataFrame(DOCS, "url string, html binary").repartition(parts)
        links = extract_anchor_links(df)
        got = sorted(tuple(r) for r in anchor_text_topk(links, k=2).collect())
        assert got == _twin_topk(2)
    # docs (3 refs across pages + case variants) tops t.com/x; 'docs here'
    # and 'guide' tie at 1 ref there and the anchor-ascending break decides
    top = {(r[0], r[3]): r[1] for r in got}
    assert top[("http://t.com/x", 1)] == "docs"
    assert top[("http://t.com/x", 2)] == "docs here"


_WORD = st.sampled_from(["docs", "Guide", "read  more", "x", "läs", ""])
_HREF = st.sampled_from(
    [
        "http://t.com/a", "http://t.com/b?q=1", "HTTPS://T.com/c",
        "/relative", "ftp://t.com/d", "mailto:x@t.com",
    ]
)
_PAGE = st.lists(st.tuples(_HREF, _WORD), min_size=0, max_size=6)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_PAGE, min_size=1, max_size=6))
def test_anchor_pipeline_matches_twin_on_random_pages(spark, pages):
    """Random pages (relative/ftp/mailto hrefs, empty and unicode anchors,
    uppercase schemes): link rows AND rollup equal the re-based twins."""
    docs = [
        (
            f"http://s{i}.com/",
            "".join(f'<a href="{h}">{t}</a>' for h, t in page).encode(),
        )
        for i, page in enumerate(pages)
    ]
    df = spark.createDataFrame(docs, "url string, html binary").repartition(3)
    got_links = sorted(
        (r["url"], r["link_idx"], r["href"], r["anchor"])
        for r in extract_anchor_links(df).collect()
    )
    twin_links = []
    for url, html in docs:
        for i, m in enumerate(re.finditer(ANCHOR_PATTERN, html.decode())):
            twin_links.append((url, i, m.group(1), m.group(2)))
    assert got_links == sorted(twin_links)

    got_topk = sorted(
        tuple(r) for r in anchor_text_topk(extract_anchor_links(df), k=2).collect()
    )
    counts: dict[tuple[str, str], int] = {}
    for _u, _i, href, anchor in twin_links:
        if not re.match(r"^\s*https?://", href, re.IGNORECASE):
            continue
        a = re.sub(r"[ \t\n\x0b\f\r]+", " ", anchor.lower()).strip(" ")
        if not a:
            continue
        key = (canonicalize_url_py(href), a)
        counts[key] = counts.get(key, 0) + 1
    by_dst: dict[str, list] = {}
    for (dst, a), n in counts.items():
        by_dst.setdefault(dst, []).append((a, n))
    twin_topk = []
    for dst, pairs in by_dst.items():
        pairs.sort(key=lambda p: (-p[1], p[0]))
        twin_topk.extend((dst, a, n, r + 1) for r, (a, n) in enumerate(pairs[:2]))
    assert got_topk == sorted(twin_topk)
