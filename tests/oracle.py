"""Single-threaded pure-Python oracle crawler — the golden semantics.

Implements exactly the reference's crawl semantics, deterministically:
FIFO breadth-first frontier (``to_crawl`` Queue,
/root/reference/crawlers/globus_base_preserved.py:427-428,256,350-351),
per-host politeness budgets + skip rules (the reference's thread/batch caps
made per-host; skip_lookup, /root/reference/application.py:119-124), and
dedup-on-first-sight (tracked_files set,
/root/reference/crawlers/globus_base_preserved.py:396-403).

The Spark engine must reproduce this crawl ORDER, URL-seen SET, and per-url
extracted TEXT byte-identically, at any parallelism.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

import pyarrow.parquet as pq

from crawler_service_spark.functions.urls import (
    canonicalize_url_py,
    host_py,
    path_py,
)
from crawler_service_spark.operators.extraction import extract_text_py

HREF_RE = re.compile(r'href="([^"]+)"')
ABS_RE = re.compile(r"^https?://")


@dataclass
class OracleResult:
    # (iteration, seq, depth, url) in exact crawl order
    order: list[tuple[int, int, int, str]] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    failures: list[tuple[int, str]] = field(default_factory=list)
    texts: dict[str, str] = field(default_factory=dict)
    iterations: int = 0


def load_fixture(paths: dict[str, str]):
    pages_tbl = pq.read_table(paths["pages"], columns=["url", "html"])
    pages = dict(zip(pages_tbl["url"].to_pylist(), pages_tbl["html"].to_pylist()))
    seeds_tbl = pq.read_table(paths["seeds"]).to_pylist()
    robots_tbl = pq.read_table(paths["robots_rules"]).to_pylist()
    return pages, seeds_tbl, robots_tbl


def oracle_crawl(
    pages: dict[str, bytes],
    seeds: list[dict],
    robots: list[dict],
    iteration_seconds: float = 30.0,
    default_delay_s: float = 1.0,
    global_cap: int | None = None,
    max_iterations: int = 10_000,
) -> OracleResult:
    delays = {r["host"]: r["crawl_delay_s"] for r in robots if r["allow"]}
    disallow = [
        (r["host"], r["path_prefix"])
        for r in robots
        if not r["allow"] and r["path_prefix"]
    ]

    def is_disallowed(host: str, path: str) -> bool:
        return any(h == host and path.startswith(p) for h, p in disallow)

    res = OracleResult()
    next_seq = 0
    pending: list[tuple[int, int, int, str, str]] = []  # (depth, -prio, seq, url, host)

    for s in sorted(seeds, key=lambda r: r["seed_order"]):
        url = canonicalize_url_py(s["url"])
        host, pth = host_py(url), path_py(url)
        if is_disallowed(host, pth) or url in res.seen:
            continue
        res.seen.add(url)
        pending.append((0, 0, next_seq, url, host))
        next_seq += 1

    k = 0
    while pending and k < max_iterations:
        k += 1
        pending.sort()  # (depth, -priority, seq) — the breadth-priority order
        taken_per_host: dict[str, int] = {}
        scheduled, rest = [], []
        for item in pending:
            host = item[4]
            budget = max(1, math.floor(iteration_seconds / delays.get(host, default_delay_s)))
            if taken_per_host.get(host, 0) < budget:
                taken_per_host[host] = taken_per_host.get(host, 0) + 1
                scheduled.append(item)
            else:
                rest.append(item)
        if global_cap is not None and len(scheduled) > global_cap:
            rest = scheduled[global_cap:] + rest
            scheduled = scheduled[:global_cap]

        for depth, negprio, seq, url, host in scheduled:
            res.order.append((k, seq, depth, url))
            html = pages.get(url)
            if html is None:
                res.failures.append((k, url))
                continue
            res.texts[url] = extract_text_py(html)
            for href in HREF_RE.findall(html.decode("utf-8")):
                curl = canonicalize_url_py(href)
                if not ABS_RE.match(curl):
                    continue
                chost, cpath = host_py(curl), path_py(curl)
                if is_disallowed(chost, cpath) or curl in res.seen:
                    continue
                res.seen.add(curl)
                rest.append((depth + 1, 0, next_seq, curl, chost))
                next_seq += 1
        pending = rest
    res.iterations = k
    return res
