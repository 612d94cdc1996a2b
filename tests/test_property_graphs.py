"""Property test (SURVEY.md §5.2): for arbitrary small link graphs, politeness
budgets, dangling links, and disallow rules, the Spark engine's crawl is
identical to the pure-Python oracle — seen set, crawl order, extracted text.
"""

from __future__ import annotations

import random
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from crawler_service_spark.engine import CrawlConfig, CrawlEngine
from tests.oracle import oracle_crawl

HOSTS = ["alpha.test", "beta.test", "gamma.test"]
PAGES_SCHEMA = "url string, html binary, lang string"
ROBOTS_SCHEMA = "host string, path_prefix string, allow boolean, crawl_delay_s double"
SEEDS_SCHEMA = "crawl_id string, url string, seed_order long"


def build_world(seed: int):
    rng = random.Random(seed)
    n = rng.randint(15, 35)
    urls = [
        f"https://{HOSTS[i % len(HOSTS)]}/d{i % 5}/page{i}" for i in range(n)
    ]
    pages = {}
    for i, u in enumerate(urls):
        links = rng.sample(urls, k=min(rng.randint(0, 4), n))
        if rng.random() < 0.3:  # dangling link -> fetch-failure path
            links.append(f"https://{HOSTS[rng.randrange(len(HOSTS))]}/missing/{i}")
        hrefs = "".join(f'<a href="{l}">l</a>' for l in links)
        pages[u] = (
            f"<html><title>t{i}</title><body><p>para {i}</p>{hrefs}</body></html>"
        ).encode()

    robots = [
        {
            "host": h,
            "path_prefix": "",
            "allow": True,
            "crawl_delay_s": float(rng.choice([1, 2, 4])),
        }
        for h in HOSTS
    ]
    if rng.random() < 0.5:
        robots.append(
            {
                "host": rng.choice(HOSTS),
                "path_prefix": f"/d{rng.randrange(5)}",
                "allow": False,
                "crawl_delay_s": 1.0,
            }
        )
    seeds = [
        {"crawl_id": "prop", "url": u, "seed_order": i}
        for i, u in enumerate(rng.sample(urls, k=rng.randint(1, 2)))
    ]
    return pages, seeds, robots


@given(seed=st.integers(min_value=0, max_value=2**31))
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_engine_equals_oracle_on_random_graphs(spark, seed):
    pages, seeds, robots = build_world(seed)
    iter_s = 3.0

    want = oracle_crawl(pages, seeds, robots, iteration_seconds=iter_s)

    pages_df = spark.createDataFrame(
        [(u, h, "en") for u, h in pages.items()], PAGES_SCHEMA
    )
    robots_df = spark.createDataFrame(
        [(r["host"], r["path_prefix"], r["allow"], r["crawl_delay_s"]) for r in robots],
        ROBOTS_SCHEMA,
    )
    seeds_df = spark.createDataFrame(
        [(s["crawl_id"], s["url"], s["seed_order"]) for s in seeds], SEEDS_SCHEMA
    )

    wd = tempfile.mkdtemp(prefix="prop-crawl-")
    try:
        eng = CrawlEngine(
            spark,
            pages=pages_df,
            robots=robots_df,
            workdir=wd,
            config=CrawlConfig(iteration_seconds=iter_s, max_iterations=100),
        )
        stats = eng.run(seeds=seeds_df)
        assert stats[-1]["status"] == "complete"

        got_seen = {r["url"] for r in eng.catalog.read("seen").collect()}
        assert got_seen == want.seen

        got_order = [
            (r["iteration"], r["seq"], r["depth"], r["url"])
            for r in sorted(
                eng.catalog.read("crawl_order").collect(),
                key=lambda r: (r["iteration"], r["depth"], -r["priority"], r["seq"]),
            )
        ]
        assert got_order == want.order

        got_texts = {
            r["url"]: r["text"] for r in eng.catalog.read("pages_out").collect()
        }
        assert got_texts == want.texts
    finally:
        shutil.rmtree(wd, ignore_errors=True)


def test_connected_components_raises_on_non_convergence(spark):
    import pytest as _pytest
    from crawler_service_spark.operators.graph import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "src long, dst long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_rounds=2)


def test_star_cc_equals_label_prop_on_random_graphs(spark):
    """large-star/small-star CC (O(log n) rounds) must agree with min-label
    propagation on arbitrary random graphs — including shapes label-prop
    finds hard (long paths)."""
    from pyspark.sql import functions as F

    from crawler_service_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(1234)
    cases = []
    for _ in range(6):
        n = rng.randint(2, 60)
        m = rng.randint(1, 2 * n)
        cases.append([(rng.randrange(n), rng.randrange(n)) for _ in range(m)])
    cases.append([(i, i + 1) for i in range(40)])          # path: diameter 40
    cases.append([(0, i) for i in range(1, 30)])            # star
    cases.append([(i, (i + 1) % 10) for i in range(10)]     # ring + satellite
                 + [(100, 5)])

    for i, raw in enumerate(cases):
        edges = spark.createDataFrame(
            [(a, b) for a, b in raw], "src long, dst long"
        )
        want = {
            (r["node"], r["component"])
            for r in connected_components(edges, max_rounds=100).collect()
        }
        got = {
            (r["node"], r["component"])
            for r in connected_components_star(edges).collect()
        }
        assert got == want, f"case {i}: star CC != label-prop"


def test_star_cc_logarithmic_rounds_on_deep_path(spark):
    """The O(log n) claim: a 60-node path (diameter 60) converges within
    max_rounds=8 for star CC, where label-prop provably cannot."""
    from crawler_service_spark.operators.graph import connected_components_star

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "src long, dst long"
    )
    labels = connected_components_star(chain, max_rounds=8).collect()
    assert {r["component"] for r in labels} == {0}
    assert len(labels) == 61


def test_pagerank_millis_matches_python_twin(spark):
    """Fixed-iteration integer PageRank == a dict-based Python twin on a
    graph with a hub, a chain, and a dangling sink; pure in-neighbor-less
    nodes stay at the base rank."""
    from pyspark.sql import functions as F

    from crawler_service_spark.operators.graph import pagerank_millis

    edges = [(1, 4), (2, 4), (3, 4), (4, 5), (5, 6), (2, 5)]  # 6 dangling
    df = spark.createDataFrame(edges, "src long, dst long")

    def py_pr(es, iters=3, d=850):
        from collections import defaultdict

        outdeg: dict[int, int] = defaultdict(int)
        for s, t in es:
            outdeg[s] += 1
        nodes = {n for e in es for n in e}
        pr = {n: 1000 for n in nodes}
        for _ in range(iters):
            s = defaultdict(int)
            for u, v in es:
                s[v] += pr[u] // outdeg[u]
            pr = {n: (1000 - d) + (d * s[n]) // 1000 for n in nodes}
        return pr

    for probe in (df, df.repartition(5)):
        got = {r["node"]: r["pr_millis"] for r in pagerank_millis(probe).collect()}
        assert got == py_pr(edges)
    assert got[1] == 150  # no in-edges -> base rank after every iteration
    # link-receiving nodes outrank pure sources (4 gets 3 in-links; 5 sits
    # downstream of the hub and has absorbed its mass by iteration 3)
    assert got[4] > got[1] and got[5] > got[4]


def test_resolve_redirects_matches_python_walk(spark):
    """Pointer doubling == a literal per-src Python walk on random
    out-degree-1 redirect graphs (chains, trees-into-chains, cycles,
    rho shapes), at multiple partitionings."""
    from pyspark.sql import functions as F  # noqa: F401

    from crawler_service_spark.operators.graph import resolve_redirects

    rng = random.Random(1234)
    for trial in range(4):
        n = rng.randint(8, 40)
        # each node < n redirects to a random node in [0, n+3): ids >= n are
        # terminal by absence; random structure yields chains + cycles
        edges = [(i, rng.randrange(n + 3)) for i in range(n) if rng.random() < 0.8]
        srcs = {s for s, _ in edges}
        nxt = dict(edges)
        budget = 16

        def walk(s):
            cur, hops = nxt[s], 1
            while hops < budget and cur in nxt:
                cur, hops = nxt[cur], hops + 1
            return (cur, hops, cur not in nxt)

        expect = {s: walk(s) for s in srcs}
        df = spark.createDataFrame(edges, "src long, dst long")
        for probe in (df, df.repartition(7)):
            got = {
                r["src"]: (r["final_dst"], r["hops"], r["resolved"])
                for r in resolve_redirects(probe, doubling_rounds=4).collect()
            }
            assert got == expect, f"trial {trial}"


def test_resolve_redirects_hop_budget_boundary(spark):
    """A 16-hop chain resolves exactly at the budget; a 17-hop chain is
    reported unresolved at 16 hops; a self-loop never resolves."""
    from crawler_service_spark.operators.graph import resolve_redirects

    chain16 = [(i, i + 1) for i in range(16)]          # 0..15 -> 16 terminal
    chain17 = [(100 + i, 100 + i + 1) for i in range(17)]
    edges = chain16 + chain17 + [(999, 999)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["src"]: (r["final_dst"], r["hops"], r["resolved"])
        for r in resolve_redirects(df, doubling_rounds=4).collect()
    }
    assert got[0] == (16, 16, True)
    assert got[100] == (116, 16, False)
    assert got[101] == (117, 16, True)
    assert got[999] == (999, 16, False)


def test_triangle_counts_exact_on_known_graph(spark):
    """4-clique (4 triangles, 3 per vertex) + pendant path + dup/reversed
    edges + self-loop: exact per-vertex counts, canonicalization pinned,
    partition-invariant."""
    from crawler_service_spark.operators.graph import triangle_counts

    edges = [
        # 4-clique on 1..4 (some reversed, one duplicated)
        (1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (3, 4),
        # pendant path 4-5-6: no new triangles
        (4, 5), (5, 6),
        # self-loop must be dropped
        (6, 6),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    expect = {
        1: (3, 3), 2: (3, 3), 3: (3, 3),  # (degree, triangles)
        4: (4, 3),
        5: (2, 0), 6: (1, 0),
    }
    for probe in (df, df.repartition(5)):
        got = {
            r["v"]: (r["degree"], r["n_triangles"])
            for r in triangle_counts(probe).collect()
        }
        assert got == expect
    # total triangle count: each counted at 3 vertices
    assert sum(t for _, t in expect.values()) == 3 * 4


def test_self_loop_only_node_kept_by_both_cc_variants(spark):
    """A node whose ONLY edges are self-loops (a self-linking page) is still
    part of the graph: both CC variants must return it as its own singleton
    component. Label-prop used to derive its node universe AFTER the
    self-loop filter and silently dropped such nodes, diverging from its
    documented star twin."""
    from crawler_service_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    edges = spark.createDataFrame([(3, 3), (1, 2)], "src long, dst long")
    want = {(1, 1), (2, 1), (3, 3)}
    lp = {
        (r["node"], r["component"])
        for r in connected_components(edges).collect()
    }
    st = {
        (r["node"], r["component"])
        for r in connected_components_star(edges).collect()
    }
    assert lp == want
    assert st == want


def test_null_endpoint_edges_dropped_by_both_cc_variants(spark):
    """A NULL endpoint identifies no node: the whole edge row is dirty and
    dropped (the asof_join NULL-key contract applied to graphs) — it must
    not surface a (NULL, NULL) output row or pull its non-NULL partner into
    the node universe. Both CC variants share the policy."""
    from crawler_service_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(None, 5), (4, None), (None, None), (1, 2)], "src long, dst long"
    )
    want = {(1, 1), (2, 1)}
    lp = {
        (r["node"], r["component"])
        for r in connected_components(edges).collect()
    }
    st = {
        (r["node"], r["component"])
        for r in connected_components_star(edges).collect()
    }
    assert lp == want
    assert st == want
