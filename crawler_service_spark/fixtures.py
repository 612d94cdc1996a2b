"""Deterministic synthetic Common-Crawl-style fixtures (FIXTURES.md §1-3).

Generates the canonical input table ``pages(url, warc_ts, html, text, lang)``
plus ``seeds`` and ``robots_rules`` — all derived from a seeded splitmix64 hash,
no wall-clock, no external data. The link graph is embedded in ``html`` as
``<a href>`` anchors so the engine (and the pure-Python oracle) must *extract*
links from content rather than trusting generator internals; ``text`` is the
stored byte-exact extraction target.

Host assignment is Zipf(s≈1.1) on purpose — the skew the politeness scheduler
and salted repartitioning must survive at 10^10-URL scale.

Reference parity: seeds mirror ``crawl_paths`` rows (crawlers/utils/
crawler_utils.py:32-38); robots_rules mirror ``skip_lookup`` patterns
(application.py:119-124) plus per-host crawl-delay budgets (the reference's
global 8-thread/10-msg caps, crawlers/globus_base_preserved.py:23,139, made
per-host and explicit).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MASK64 = (1 << 64) - 1

_PAD = " ".join(
    # ~24 KiB of deterministic word salad (module-level, built once)
    __import__("itertools").islice(
        (w for _ in range(400) for w in (
            "lorem", "ipsum", "dolor", "sit", "amet", "consectetur", "adipiscing",
            "elit", "sed", "do", "eiusmod", "tempor", "incididunt", "ut", "labore",
        )),
        4000,
    )
)

LANGS = ["en", "de", "fr", "es", "zh"]
EXTS = ["html", "html", "html", "txt", "csv", "png", "zip"]  # weighted
_WORDS = (
    "data spark frontier crawl page host link queue batch shuffle "
    "partition bloom filter depth seed robot delay budget hash url "
    "iceberg snapshot commit lineage metric window rank fetch extract"
).split()

BASE_TS = datetime(2026, 1, 1, tzinfo=timezone.utc)


def _mix(x: int) -> int:
    """splitmix64 finalizer (public-domain constant set)."""
    x = (x + 0x9E3779B97F4A7C15) & MASK64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & MASK64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & MASK64
    return x ^ (x >> 31)


def h64(*vals: int, seed: int = 42) -> int:
    acc = _mix(seed)
    for v in vals:
        acc = _mix(acc ^ (v & MASK64))
    return acc


@dataclass(frozen=True)
class FixtureSpec:
    n_pages: int = 1000
    n_hosts: int = 16
    n_seeds: int = 4
    seed: int = 42
    max_out_degree: int = 8
    # pad the single <p> paragraph up to ~this many extra bytes of
    # deterministic word-salad: realistic Common-Crawl page sizes (tens of
    # KB) for throughput/scaling benchmarks. 0 = tiny pages (unit tests).
    pad_bytes: int = 0
    # adversarial host skew: host 0 takes this share of all pages, the rest
    # follow the usual Zipf tail (0.0 = plain Zipf). 0.5 is the mega-host
    # regime the salted politeness window exists for (tools/skew_bench.py,
    # BASELINE.md round-3 skew table).
    mega_share: float = 0.0


def _zipf_cdf(n_hosts: int, s: float = 1.1, mega_share: float = 0.0) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n_hosts + 1), s)
    if mega_share > 0.0:
        # host 0 gets EXACTLY mega_share: zero its Zipf weight first, scale
        # the remaining tail to 1-mega_share (leaving w[0]'s original weight
        # in the tail sum skewed host 0 to ~0.56 for a requested 0.5)
        w[0] = 0.0
        w = w / w.sum() * (1.0 - mega_share)
        w[0] = mega_share
        return np.cumsum(w / w.sum())
    return np.cumsum(w / w.sum())


def host_of(i: int, spec: FixtureSpec, cdf: np.ndarray) -> int:
    u = h64(i, 0, seed=spec.seed) / float(1 << 64)
    return int(np.searchsorted(cdf, u))


def url_of(i: int, host: int, spec: FixtureSpec) -> str:
    d0 = h64(i, 1, seed=spec.seed) % 20
    ext = EXTS[h64(i, 6, seed=spec.seed) % len(EXTS)]
    return f"http://host{host:03d}.example/p/{d0:02d}/{i:08d}.{ext}"


def build_page(i: int, urls: list[str], spec: FixtureSpec) -> tuple[bytes, str, str]:
    """Return (html, text, lang) for page i. Deterministic; no randomness source
    other than the seeded hash."""
    seed = spec.seed
    title = f"Page {i} of {urls[i].split('/')[2]}"
    deg = h64(i, 2, seed=seed) % (spec.max_out_degree + 1)
    anchors = []
    for j in range(deg):
        t = h64(i, 3, j, seed=seed) % len(urls)
        anchors.append(f'<a href="{urls[t]}">link {j}</a>')
    nw = 5 + h64(i, 4, seed=seed) % 20
    filler = " ".join(_WORDS[h64(i, 5, w, seed=seed) % len(_WORDS)] for w in range(nw))
    if spec.pad_bytes > 0:
        # cheap deterministic pad: slice a long base string at a per-page
        # offset (O(pad) C-level copy, no per-word Python hashing)
        off = h64(i, 8, seed=seed) % 199
        filler = filler + " " + _PAD[off : off + spec.pad_bytes]
    html = (
        f"<html><head><title>{title}</title></head>"
        f"<body>{''.join(anchors)}<p>{filler}</p></body></html>"
    ).encode("utf-8")
    text = f"{title}\n{filler}"
    lang = LANGS[h64(i, 7, seed=seed) % len(LANGS)]
    return html, text, lang


def generate_fixture(spec: FixtureSpec, out_dir: str) -> dict[str, str]:
    """Write pages/seeds/robots_rules parquet under ``out_dir``; return paths.

    Idempotent: skips generation when the directory already holds a fixture for
    the same spec (marker file). Writes in chunks so multi-million-page bench
    fixtures don't hold everything in memory at once.
    """
    os.makedirs(out_dir, exist_ok=True)
    pad_sfx = f"_{spec.pad_bytes}" if spec.pad_bytes else ""
    # v2: exact-share weight formula (host 0 zeroed before tail scaling)
    skew_sfx = f"_m{spec.mega_share}v2" if spec.mega_share else ""
    marker = os.path.join(
        out_dir,
        f"_SPEC_{spec.n_pages}_{spec.n_hosts}_{spec.n_seeds}_{spec.seed}{pad_sfx}{skew_sfx}",
    )
    paths = {
        "pages": os.path.join(out_dir, "pages.parquet"),
        "seeds": os.path.join(out_dir, "seeds.parquet"),
        "robots_rules": os.path.join(out_dir, "robots_rules.parquet"),
    }
    if os.path.exists(marker):
        return paths

    cdf = _zipf_cdf(spec.n_hosts, mega_share=spec.mega_share)
    hosts = [host_of(i, spec, cdf) for i in range(spec.n_pages)]
    urls = [url_of(i, hosts[i], spec) for i in range(spec.n_pages)]

    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us", tz="UTC")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    writer = pq.ParquetWriter(paths["pages"], schema)
    chunk = 100_000
    for lo in range(0, spec.n_pages, chunk):
        hi = min(lo + chunk, spec.n_pages)
        rows = [build_page(i, urls, spec) for i in range(lo, hi)]
        ts = [int(BASE_TS.timestamp() * 1_000_000) + (i % 86_400) * 1_000_000 for i in range(lo, hi)]
        writer.write_table(
            pa.table(
                {
                    "url": urls[lo:hi],
                    "warc_ts": pa.array(ts, pa.timestamp("us", tz="UTC")),
                    "html": [r[0] for r in rows],
                    "text": [r[1] for r in rows],
                    "lang": [r[2] for r in rows],
                },
                schema=schema,
            )
        )
    writer.close()

    # seeds: spread across the page index space; deterministic order
    stride = max(1, spec.n_pages // spec.n_seeds)
    seed_urls = [urls[(k * stride) % spec.n_pages] for k in range(spec.n_seeds)]
    pq.write_table(
        pa.table(
            {
                "crawl_id": ["crawl-fixture-0001"] * spec.n_seeds,
                "url": seed_urls,
                "seed_order": list(range(spec.n_seeds)),
                "grouper": ["simple_ext"] * spec.n_seeds,
            }
        ),
        paths["seeds"],
    )

    # robots: every host gets a crawl delay; every 3rd host a disallow prefix
    r_host, r_prefix, r_allow, r_delay = [], [], [], []
    for hidx in range(spec.n_hosts):
        host = f"host{hidx:03d}.example"
        delay = 0.5 * (1 + h64(hidx, 100, seed=spec.seed) % 6)
        r_host.append(host); r_prefix.append(""); r_allow.append(True); r_delay.append(delay)
        if hidx % 3 == 0:
            bad = h64(hidx, 101, seed=spec.seed) % 20
            r_host.append(host); r_prefix.append(f"/p/{bad:02d}")
            r_allow.append(False); r_delay.append(delay)
    pq.write_table(
        pa.table(
            {
                "host": r_host,
                "path_prefix": r_prefix,
                "allow": r_allow,
                "crawl_delay_s": pa.array(r_delay, pa.float64()),
            }
        ),
        paths["robots_rules"],
    )

    with open(marker, "w") as f:
        f.write("ok\n")
    return paths
