"""Politeness-scheduler unit tests (SURVEY.md §2.5 W1-W3, §2.2 F2/J4):
per-host budgets, breadth-priority order, salt-lane equivalence, robots filter.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from crawler_service_spark.operators import politeness

ROBOTS = [
    # host, path_prefix, allow, crawl_delay_s
    ("a.com", "", True, 1.0),
    ("b.com", "", True, 5.0),
    ("b.com", "/private", False, 5.0),
    ("c.com", "/tmp", False, 2.0),
]
ROBOTS_SCHEMA = "host string, path_prefix string, allow boolean, crawl_delay_s double"


def robots_df(spark):
    return spark.createDataFrame(ROBOTS, ROBOTS_SCHEMA)


def pending_df(spark, rows):
    # (url, url_hash, host, path, depth, priority, seq)
    return spark.createDataFrame(
        rows,
        "url string, url_hash long, host string, path string, "
        "depth int, priority int, seq long",
    )


def mk_rows(host, n, depth=0, prio=0, start_seq=0):
    return [
        (f"https://{host}/p{i}", hash((host, i)), host, f"/p{i}", depth, prio, start_seq + i)
        for i in range(n)
    ]


def test_host_budgets_from_crawl_delay(spark):
    budgets = {
        r["host"]: r["host_budget"]
        for r in politeness.host_budgets(robots_df(spark), 10.0).collect()
    }
    assert budgets["a.com"] == 10  # floor(10/1)
    assert budgets["b.com"] == 2   # floor(10/5)
    assert budgets["c.com"] == 5   # floor(10/2)


def test_schedule_respects_budget_and_breadth_order(spark):
    rows = mk_rows("a.com", 25) + mk_rows("b.com", 25, start_seq=100)
    pending = pending_df(spark, rows)
    budgets = politeness.host_budgets(robots_df(spark), 10.0)
    picked = politeness.schedule(pending, budgets, 10.0).collect()
    by_host = {}
    for r in picked:
        by_host.setdefault(r["host"], []).append(r["seq"])
    assert sorted(by_host["a.com"]) == list(range(10))       # top-10 by seq
    assert sorted(by_host["b.com"]) == [100, 101]            # budget 2
    # breadth order: lower depth always beats higher depth within a host
    deep = mk_rows("b.com", 3, depth=2, start_seq=50) + mk_rows(
        "b.com", 3, depth=1, start_seq=200
    )
    picked2 = politeness.schedule(pending_df(spark, deep), budgets, 10.0).collect()
    assert sorted(r["seq"] for r in picked2) == [200, 201]   # depth 1 wins despite larger seq


def test_salt_lanes_change_nothing(spark):
    rows = mk_rows("a.com", 40) + mk_rows("b.com", 40, start_seq=100) + mk_rows(
        "c.com", 40, depth=1, start_seq=300
    )
    pending = pending_df(spark, rows)
    budgets = politeness.host_budgets(robots_df(spark), 10.0)
    unsalted = politeness.schedule(pending, budgets, 10.0, salt_lanes=1)
    salted = politeness.schedule(pending, budgets, 10.0, salt_lanes=8)
    assert sorted(map(tuple, unsalted.collect())) == sorted(map(tuple, salted.collect()))


def test_global_cap_picks_global_top(spark):
    rows = mk_rows("a.com", 8) + mk_rows("b.com", 8, start_seq=2)
    budgets = politeness.host_budgets(robots_df(spark), 100.0)  # budgets >> cap
    picked = politeness.schedule(
        pending_df(spark, rows), budgets, 100.0, global_cap=5
    ).collect()
    assert sorted(r["seq"] for r in picked) == [0, 1, 2, 2, 3]


def test_robots_filter_drops_disallowed_prefixes(spark):
    cand = spark.createDataFrame(
        [
            ("https://b.com/private/x", "b.com", "/private/x"),
            ("https://b.com/public/x", "b.com", "/public/x"),
            ("https://c.com/tmp/y", "c.com", "/tmp/y"),
            ("https://a.com/tmp/y", "a.com", "/tmp/y"),  # /tmp only blocked on c.com
        ],
        "url string, host string, path string",
    )
    kept = sorted(
        r["url"] for r in politeness.robots_filter(cand, robots_df(spark)).collect()
    )
    assert kept == ["https://a.com/tmp/y", "https://b.com/public/x"]


def test_default_budget_for_unknown_host(spark):
    rows = mk_rows("unknown.net", 30)
    budgets = politeness.host_budgets(robots_df(spark), 10.0)
    picked = politeness.schedule(
        pending_df(spark, rows), budgets, 10.0, default_delay_s=2.0
    )
    assert picked.count() == math.floor(10.0 / 2.0)


def test_parse_robots_sections_comments_and_filter_integration(spark):
    """Sectional parsing: only the * block is honored, comments/blank lines
    ignored, empty Disallow == allow-all, crawl-delay host-wide; parsed rules
    drive robots_filter directly."""
    from pyspark.sql import functions as F

    from crawler_service_spark.operators.politeness import robots_filter
    from crawler_service_spark.operators.robots import parse_robots, robots_filter_spec

    body_a = (
        "# comment\n"
        "User-agent: googlebot\nDisallow: /google-only\n"
        "\n"
        "User-agent: *\n"
        "Crawl-delay: 2.5\n"
        "Disallow: /private\n"
        "Allow: /private/pub\n"
    )
    body_b = "User-agent: *\nDisallow:\n"  # allow-all idiom
    df = spark.createDataFrame(
        [("a.com", body_a), ("b.com", body_b)], "host string, robots_txt string"
    )
    rules = parse_robots(df)
    got = {
        (r["host"], r["path_prefix"]): (r["allow"], r["crawl_delay_s"])
        for r in rules.collect()
    }
    assert got == {
        ("a.com", "/private"): (False, 2.5),
        ("a.com", "/private/pub"): (True, 2.5),
        ("b.com", ""): (True, 1.0),
    }
    # the googlebot-only rule must NOT leak into the * rules
    assert ("a.com", "/google-only") not in got

    cand = spark.createDataFrame(
        [("a.com", "/private/x"), ("a.com", "/private/pub/y"), ("a.com", "/ok"),
         ("b.com", "/anything")],
        "host string, path string",
    )
    # engine contract (any matching Disallow blocks; Allow rows only feed
    # budgets) — what the crawl oracle implements:
    kept = sorted(
        (r["host"], r["path"]) for r in robots_filter(cand, rules).collect()
    )
    assert kept == [("a.com", "/ok"), ("b.com", "/anything")]
    # Google-spec precedence (longest match governs, Allow wins ties):
    kept_spec = sorted(
        (r["host"], r["path"]) for r in robots_filter_spec(cand, rules).collect()
    )
    assert kept_spec == [
        ("a.com", "/ok"), ("a.com", "/private/pub/y"), ("b.com", "/anything")
    ]
    # duplicate candidate rows keep their multiplicity through the semi-join
    dup = cand.union(cand.filter("path = '/ok'"))
    assert robots_filter_spec(dup, rules).filter("path = '/ok'").count() == 2


def test_parse_robots_multi_agent_group(spark):
    """RFC 9309: consecutive User-agent lines share ONE rule group — '*'
    listed first (before another agent) must still receive the group's rules
    (ADVICE r2: the old last-UA-wins parser dropped them)."""
    from crawler_service_spark.operators.robots import parse_robots

    body = (
        "User-agent: *\nUser-agent: foo\nDisallow: /x\n\n"
        "User-agent: bar\nDisallow: /bar-only\n"
    )
    df = spark.createDataFrame([("c.com", body)], "host string, robots_txt string")
    got = {(r["host"], r["path_prefix"]): r["allow"] for r in parse_robots(df).collect()}
    assert got == {("c.com", "/x"): False}


def test_parse_sitemaps_global_scope_and_edge_cases(spark):
    """Sitemap lines extract regardless of user-agent grouping (global per
    the sitemaps protocol), keys match case-insensitively, URLs keep their
    colons, commented-out and empty directives drop, duplicates collapse."""
    from crawler_service_spark.operators.robots import parse_sitemaps

    body = "\n".join([
        "User-agent: googlebot",
        "Disallow: /g",
        "Sitemap: https://a.example.com/inside-group.xml",  # global anyway
        "",
        "User-agent: *",
        "Disallow: /private",
        "SITEMAP: https://a.example.com/caps.xml",
        "# Sitemap: https://a.example.com/commented.xml",
        "Sitemap:",                                          # empty -> drop
        "sitemap: https://a.example.com/caps.xml",           # dup -> collapse
    ])
    df = spark.createDataFrame([("a.example.com", body)], "host string, robots_txt string")
    got = {
        (r["host"], r["sitemap_url"]) for r in parse_sitemaps(df).collect()
    }
    assert got == {
        ("a.example.com", "https://a.example.com/inside-group.xml"),
        ("a.example.com", "https://a.example.com/caps.xml"),
    }


def test_budget_allocation_matches_python_twin_and_sums_exactly(spark):
    """Hamilton apportionment: equals a literal Python twin, sum(budget)
    is bit-exactly the total budget, invariant to n_buckets and input
    partitioning, zero-score hosts excluded, remainder ties break host ASC."""
    from crawler_service_spark.operators.politeness import budget_allocation

    rows = [(f"h{i:03d}", (i * 37) % 11 + (1 if i % 3 else 0)) for i in range(40)]
    rows += [("hzero", 0), ("hneg", -5)]  # excluded
    df = spark.createDataFrame(rows, "host string, score long")
    B = 1000

    live = [(h, s) for h, s in rows if s > 0]
    total = sum(s for _, s in live)
    floor = {h: (B * s) // total for h, s in live}
    rem = {h: (B * s) % total for h, s in live}
    left = B - sum(floor.values())
    order = sorted(live, key=lambda hs: (-rem[hs[0]], hs[0]))
    expect = {
        h: (s, floor[h], rem[h], floor[h] + (1 if rk < left else 0))
        for rk, (h, s) in enumerate(order)
    }

    for probe, nb in ((df, 64), (df.repartition(7), 64), (df, 3), (df, 1)):
        got = {
            r["host"]: (r["score"], r["floor_share"], r["rem"], r["budget"])
            for r in budget_allocation(
                probe, total_budget=B, n_buckets=nb
            ).collect()
        }
        assert got == expect
        assert sum(v[3] for v in got.values()) == B
        assert "hzero" not in got and "hneg" not in got
    assert 0 < left < len(live)  # the fixture actually exercises the remainder rank


def test_crawl_delay_zero_is_unthrottled_not_minimum(spark):
    """Crawl-delay: 0 declares NO throttle — the budget must saturate at the
    int32 max, not collapse to the minimum of 1 (non-ANSI 10/0.0 is NULL and
    greatest(1, NULL) used to book the tightest budget for the one host that
    asked for none). A sub-nanosecond delay must saturate too, not wrap the
    int32 cast back to NULL."""
    rows = [
        ("zero.com", "", True, 0.0),
        ("tiny.com", "", True, 1e-9),
        ("neg.com", "", True, -3.0),  # junk directive, same bucket as 0
        ("a.com", "", True, 1.0),
    ]
    budgets = {
        r["host"]: r["host_budget"]
        for r in politeness.host_budgets(
            spark.createDataFrame(rows, ROBOTS_SCHEMA), 10.0
        ).collect()
    }
    assert budgets["zero.com"] == 2147483647
    assert budgets["tiny.com"] == 2147483647
    assert budgets["neg.com"] == 2147483647
    assert budgets["a.com"] == 10  # the normal path is untouched


def test_absent_crawl_delay_inherits_parser_default(spark):
    """Robots rows with a NULL crawl_delay_s (robots present, no Crawl-delay
    directive — possible on hand-built frames; parse_robots coalesces at
    parse time) inherit DEFAULT_DELAY_S: default pacing, NOT the int32-max
    unthrottled budget reserved for an explicit <= 0 declaration. A declared
    delay on any sibling row still governs via the per-host max."""
    rows = [
        ("nodirective.com", "", True, None),
        ("mixed.com", "", True, None),
        ("mixed.com", "/a", True, 2.0),
        ("zero.com", "", True, 0.0),
    ]
    budgets = {
        r["host"]: r["host_budget"]
        for r in politeness.host_budgets(
            spark.createDataFrame(rows, ROBOTS_SCHEMA), 10.0
        ).collect()
    }
    assert budgets["nodirective.com"] == 10  # floor(10 / DEFAULT_DELAY_S=1.0)
    assert budgets["mixed.com"] == 5  # declared max 2.0 governs
    assert budgets["zero.com"] == 2147483647  # explicit 0 stays unthrottled


def test_parse_sitemap_xml_urlset_index_and_text(spark):
    """Both sitemaps.org document shapes parse entry-wise (lastmod pairs
    inside its block, never positionally); plain-text docs yield nothing."""
    import re

    from crawler_service_spark.operators.robots import parse_sitemap_xml

    urlset = (
        "<?xml version=\"1.0\"?>\n<urlset>\n"
        "  <url><loc> http://a.com/p1 </loc><lastmod>2024-01-02</lastmod></url>\n"
        "  <url><loc>http://a.com/p2</loc></url>\n"            # no lastmod
        "  <url><lastmod>2024-03-04</lastmod></url>\n"          # no loc: drops
        "  <url><loc>http://a.com/p3\n</loc><lastmod>2024-05-06</lastmod></url>\n"
        # sitemaps.org REQUIRES entity-escaped URLs: &amp; must decode, and
        # a double-escaped &amp;lt; must yield the literal '&lt;' exactly once
        "  <url><loc>http://a.com/q?a=1&amp;b=2&amp;lt;</loc></url>\n"
        # CDATA wrapper is markup, not URL bytes
        "  <url><loc><![CDATA[http://a.com/cdata?x=1&y=2]]></loc></url>\n"
        "</urlset>"
    )
    index = (
        "<sitemapindex>"
        "<sitemap><loc>http://a.com/sub1.xml</loc></sitemap>"
        "<sitemap><loc>http://a.com/sub2.xml</loc>"
        "<lastmod>2023-12-31</lastmod></sitemap>"
        "</sitemapindex>"
    )
    plain = "http://a.com/x\nhttp://a.com/y\n"
    df = spark.createDataFrame(
        [
            ("http://a.com/sitemap.xml", urlset),
            ("http://a.com/sitemap_index.xml", index),
            ("http://a.com/plain.txt", plain),
        ],
        "sitemap_url string, xml string",
    )
    got = sorted(tuple(r) for r in parse_sitemap_xml(df).collect())
    assert got == [
        ("http://a.com/sitemap.xml", "http://a.com/cdata?x=1&y=2", None, False),
        ("http://a.com/sitemap.xml", "http://a.com/p1", "2024-01-02", False),
        ("http://a.com/sitemap.xml", "http://a.com/p2", None, False),
        ("http://a.com/sitemap.xml", "http://a.com/p3", "2024-05-06", False),
        ("http://a.com/sitemap.xml", "http://a.com/q?a=1&b=2&lt;", None, False),
        ("http://a.com/sitemap_index.xml", "http://a.com/sub1.xml", None, True),
        ("http://a.com/sitemap_index.xml", "http://a.com/sub2.xml", "2023-12-31", True),
    ]
    # cross-check the urlset rows against a literal python re walk mirroring
    # the declared contract: CDATA shed, the five entities decoded &amp; last
    loc_re = r"(?s)<loc>\s*(?:<!\[CDATA\[)?\s*(.*?)\s*(?:\]\]>)?\s*</loc>"
    twin = []
    for b in re.findall(r"(?s)<url>(.*?)</url>", urlset):
        loc = re.search(loc_re, b)
        lm = re.search(r"(?s)<lastmod>\s*(.*?)\s*</lastmod>", b)
        if loc and loc.group(1):
            u = loc.group(1)
            for ent, ch in (
                ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                ("&apos;", "'"), ("&amp;", "&"),
            ):
                u = u.replace(ent, ch)
            twin.append((u, lm.group(1) if lm else None))
    assert sorted((g[1], g[2]) for g in got if not g[3]) == sorted(twin)


def test_parse_sitemap_xml_matches_twin_on_random_docs(spark):
    """Fuzz the sitemap parser: random entry mixes (CDATA, escaped URLs,
    missing lastmod/loc, whitespace padding) against the re-based twin."""
    import random
    import re

    from crawler_service_spark.operators.robots import parse_sitemap_xml

    rng = random.Random(7)
    raw_urls = [
        "http://h.com/a", "http://h.com/q?a=1&b=2", "http://h.com/<odd>",
        "http://h.com/sp ace", "http://h.com/it's",
    ]

    def esc(u):
        for ch, ent in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"),
                        ('"', "&quot;"), ("'", "&apos;")):
            u = u.replace(ch, ent)
        return u

    docs = []
    for d in range(12):
        entries = []
        for _e in range(rng.randint(0, 5)):
            u = rng.choice(raw_urls)
            body = f"<![CDATA[{u}]]>" if rng.random() < 0.3 else esc(u)
            pad = rng.choice(["", " ", "\n  "])
            loc = f"<loc>{pad}{body}{pad}</loc>" if rng.random() < 0.9 else ""
            lm = (
                f"<lastmod>2024-0{rng.randint(1, 9)}-01</lastmod>"
                if rng.random() < 0.5
                else ""
            )
            entries.append(f"<url>{loc}{lm}</url>")
        docs.append((f"http://h.com/s{d}.xml", f"<urlset>{''.join(entries)}</urlset>"))

    df = spark.createDataFrame(docs, "sitemap_url string, xml string").repartition(4)
    key = lambda t: (t[0], t[1], t[2] or "", t[3])  # None lastmod sorts as ''
    got = sorted((tuple(r) for r in parse_sitemap_xml(df).collect()), key=key)

    loc_re = r"(?s)<loc>\s*(?:<!\[CDATA\[)?\s*(.*?)\s*(?:\]\]>)?\s*</loc>"
    twin = []
    for sm, xml in docs:
        for b in re.findall(r"(?s)<url>(.*?)</url>", xml):
            loc = re.search(loc_re, b)
            lm = re.search(r"(?s)<lastmod>\s*(.*?)\s*</lastmod>", b)
            if loc and loc.group(1):
                u = loc.group(1)
                for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                                ("&apos;", "'"), ("&amp;", "&")):
                    u = u.replace(ent, ch)
                twin.append((sm, u, lm.group(1) if lm else None, False))
    assert got == sorted(twin, key=key)
    # round-trip property: every escaped original URL comes back byte-exact
    assert {g[1] for g in got} <= set(raw_urls)
