"""Full saturated-crawl scaling under adversarial host skew.

Complements tools/skew_bench.py (isolated scheduler window) with the number
that actually answers VERDICT r2 item 6: does the NORTH-RULE regime — the
whole saturated-frontier crawl iteration, schedule through fetch/extract/
dedup/commit — still scale >=0.8 from N to 4N cores when ONE host owns half
the frontier and the politeness window would otherwise sort it in one task?

Fixture: the standard sat-bench page shape (12 KiB padded html, 192 hosts)
with FixtureSpec.mega_share=0.5 — host000 holds ~50% of all pages. Grid:
salt_lanes {1, 8} x cpus {2, 8}, best-of-REPS walls, same input every cell.

Usage: PYTHONPATH=/root/repo python tools/skew_crawl_bench.py [n_pages]
Prints one JSON line; BASELINE.md "Measured (round 3)" records it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from crawler_service_spark.fixtures import FixtureSpec, generate_fixture

N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
REPS = 2


def main() -> None:
    spec = FixtureSpec(
        n_pages=N_PAGES, n_hosts=192, n_seeds=64, seed=42,
        pad_bytes=12_288, mega_share=0.5,
    )
    out = os.path.join(bench.CACHE, f"fixture-skew-{N_PAGES}")
    t0 = time.monotonic()
    paths = generate_fixture(spec, out)
    print(f"skew fixture: {N_PAGES} pages, mega_share=0.5 "
          f"({time.monotonic()-t0:.1f}s)", file=sys.stderr, flush=True)

    cells = {}
    for lanes in (1, 8):
        for cpus in (2, 8):
            best = None
            for _ in range(REPS):
                r = bench.run_saturated(cpus, paths, f"skew-l{lanes}-n{cpus}",
                                        salt_lanes=lanes)
                best = r if best is None or r["wall_sec"] < best["wall_sec"] else best
            cells[f"lanes{lanes}_n{cpus}"] = best
            print(json.dumps({f"lanes{lanes}_n{cpus}": best}), file=sys.stderr, flush=True)
    for lanes in (1, 8):
        lo = cells[f"lanes{lanes}_n2"]["throughput_urls_per_sec"]
        hi = cells[f"lanes{lanes}_n8"]["throughput_urls_per_sec"]
        cells[f"efficiency_lanes{lanes}"] = round((hi / lo) / 4.0, 3)
    print(json.dumps({"n_pages": N_PAGES, "mega_share": 0.5, **cells}))


if __name__ == "__main__":
    main()
