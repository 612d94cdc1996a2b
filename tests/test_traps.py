"""Spider-trap detection: the host census and the per-template cap must
match a literal Python walk over the same URLs, at any parallelism."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from crawler_service_spark.functions.urls import (
    canonicalize_url_py,
    host_py,
    path_py,
)
from crawler_service_spark.operators.traps import (
    cap_per_template,
    host_trap_stats,
    trap_hosts,
)


# --------------------------------------------------------------------- twin
def _template_py(path: str) -> str:
    t = path.lower()
    t = re.sub(r"[0-9a-f]{8,}", "@", t)
    return re.sub(r"[0-9]+", "#", t)


def _features_py(urls):
    feats = []
    for u in urls:
        cu = canonicalize_url_py(u)
        host = host_py(cu)
        if not host:
            continue
        fullpath = path_py(cu)
        q = fullpath.find("?")
        path, query = (
            (fullpath, None) if q < 0 else (fullpath[:q], fullpath[q + 1 :])
        )
        segs = [s for s in path.split("/") if s]
        keyset = (
            None
            if query is None
            else "&".join(sorted({kv.split("=", 1)[0] for kv in query.split("&")}))
        )
        feats.append(
            dict(
                curl=cu,
                host=host,
                template=_template_py(path),
                depth=len(segs),
                seg_repeat=max((segs.count(s) for s in set(segs)), default=0),
                query=query,
                keyset=keyset,
            )
        )
    return feats


def _stats_py(urls, ratio=10_000, min_urls=32, max_depth=32, cycle=3):
    by_host: dict[str, list[dict]] = {}
    for f in _features_py(urls):
        by_host.setdefault(f["host"], []).append(f)
    out = {}
    for host, fs in by_host.items():
        n_urls = len({f["curl"] for f in fs})
        n_tpl = len({f["template"] for f in fs})
        n_q = len({f["query"] for f in fs if f["query"] is not None})
        n_ks = len({f["keyset"] for f in fs if f["keyset"] is not None})
        upt = 1000 * n_urls // n_tpl
        qpk = 1000 * n_q // n_ks if n_ks else 0
        d_max = max(f["depth"] for f in fs)
        r_max = max(f["seg_repeat"] for f in fs)
        out[host] = (
            n_urls,
            n_tpl,
            upt,
            d_max,
            r_max,
            n_q,
            n_ks,
            qpk,
            upt >= ratio and n_urls >= min_urls,
            r_max >= cycle,
            d_max > max_depth,
            qpk >= ratio and n_q >= min_urls,
        )
    return out


def _cap_py(urls, k):
    groups: dict[tuple[str, str], set[str]] = {}
    for f in _features_py(urls):
        groups.setdefault((f["host"], f["template"]), set()).add(f["curl"])
    return sorted(
        (h, t, u)
        for (h, t), cus in groups.items()
        for u in sorted(cus)[:k]
    )


# ------------------------------------------------------------------ fixture
def _fixture_urls():
    urls = []
    # calendar trap: one template, 60 distinct date pages
    for m in range(1, 7):
        for d in range(1, 11):
            urls.append(f"http://cal.example.com/events/2021/{m:02d}/{d:02d}")
    # session-id query trap: 40 hex sids over ONE key set {p, sid}
    for i in range(40):
        sid = f"{i:08d}abcdef{i % 10}{i % 7}"  # 16-char hex-ish id
        urls.append(f"http://shop.example.com/item?sid={sid}&p={i % 3}")
    # path-cycle trap
    urls.append("http://loop.example.com/a/b/a/b/a/b/page.html")
    # depth trap (40 segments)
    urls.append("http://deep.example.com/" + "/".join(f"s{i}" for i in range(40)))
    # healthy host: 20 pages, (almost) all distinct templates, few queries
    for i, name in enumerate(
        ["about", "contact", "news", "team", "careers", "blog", "docs",
         "faq", "press", "legal", "privacy", "terms", "support", "status",
         "pricing", "download", "community", "partners", "security", "api"]
    ):
        urls.append(f"http://ok.example.com/{name}")
    # duplicates + a scheme-less junk row the census must ignore
    urls.append("http://cal.example.com/events/2021/01/01")  # dup canonical
    urls.append("not a url")
    return urls


def test_host_census_matches_python_twin(spark):
    urls = _fixture_urls()
    df = spark.createDataFrame([(u,) for u in urls], "url string").repartition(7)
    got = {
        r["host"]: (
            r["urls"],
            r["templates"],
            r["urls_per_template_permille"],
            r["depth_max"],
            r["seg_repeat_max"],
            r["queries"],
            r["keysets"],
            r["queries_per_keyset_permille"],
            r["trap_template"],
            r["trap_cycle"],
            r["trap_depth"],
            r["trap_query"],
        )
        for r in host_trap_stats(df).collect()
    }
    assert got == _stats_py(urls)
    flagged = {r["host"] for r in trap_hosts(host_trap_stats(df)).collect()}
    assert flagged == {
        "cal.example.com",      # 60 urls / 1 template
        "shop.example.com",     # 40 query strings / 1 key set
        "loop.example.com",     # /a/b/a/b/a/b
        "deep.example.com",     # depth 40 > 32
    }
    assert "ok.example.com" not in flagged


def test_cap_per_template_is_exact_and_parallelism_invariant(spark):
    urls = _fixture_urls()
    want = _cap_py(urls, k=5)

    def run(parts: int, salt: int):
        df = spark.createDataFrame([(u,) for u in urls], "url string").repartition(parts)
        return sorted(
            tuple(r) for r in cap_per_template(df, k=5, salt=salt).collect()
        )

    assert run(3, salt=64) == want
    # same survivors at other parallelism and other salt (total order on url)
    assert run(11, salt=2) == want
    # the calendar trap kept exactly its 5 smallest URLs; healthy host whole
    by_host: dict[str, int] = {}
    for h, _t, _u in want:
        by_host[h] = by_host.get(h, 0) + 1
    assert by_host["cal.example.com"] == 5
    assert by_host["ok.example.com"] == 20


_SEG = st.sampled_from(
    ["a", "b", "page", "2021", "0007", "deadbeefcafe1234", "x9", "01", "items"]
)
_URL = st.builds(
    lambda host, segs, q: "http://%s/%s%s" % (host, "/".join(segs), q),
    st.sampled_from(["h0.example.com", "h1.example.com", "H2.Example.Com"]),
    st.lists(_SEG, min_size=0, max_size=6),
    st.sampled_from(["", "?k=1", "?k=2&s=deadbeefcafe1234", "?s=5", "#frag"]),
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_URL, min_size=1, max_size=40))
def test_census_and_cap_match_twin_on_random_urls(spark, urls):
    """Random hosts/segments/queries (digit runs, hex ids, fragments, mixed
    case, duplicates): census stats and cap survivors equal the Python twin."""
    df = spark.createDataFrame([(u,) for u in urls], "url string").repartition(5)
    got = {
        r["host"]: (
            r["urls"], r["templates"], r["urls_per_template_permille"],
            r["depth_max"], r["seg_repeat_max"], r["queries"], r["keysets"],
            r["queries_per_keyset_permille"], r["trap_template"],
            r["trap_cycle"], r["trap_depth"], r["trap_query"],
        )
        for r in host_trap_stats(df).collect()
    }
    assert got == _stats_py(urls)
    got_cap = sorted(tuple(r) for r in cap_per_template(df, k=2, salt=4).collect())
    assert got_cap == _cap_py(urls, k=2)


def test_census_thresholds_are_parameters(spark):
    """Tightening min_urls below the calendar host's page count un-flags it;
    loosening depth flags the 40-segment host only when the bound is under
    its depth — pins that flags derive from the published stats columns."""
    urls = _fixture_urls()
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    strict = {
        r["host"]: r["trap_template"]
        for r in host_trap_stats(df, min_urls=100).collect()
    }
    assert not strict["cal.example.com"]
    deep = {
        r["host"]: r["trap_depth"]
        for r in host_trap_stats(df, max_depth=64).collect()
    }
    assert not deep["deep.example.com"]
