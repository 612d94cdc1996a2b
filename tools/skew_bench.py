"""Adversarial host-skew benchmark for the politeness scheduler.

VERDICT r2 item 6: the salted two-stage top-k (operators/politeness.py:18-24,
98-104) is the engine's answer to Zipf-shaped frontiers, but the standard
bench fixture spreads pending over 192 hosts with only mild skew. This tool
builds the worst case the design claims to survive — ONE host holding ~50% of
the pending set with a budget orders of magnitude below its pending count —
and measures `schedule()` wall time / throughput with salt_lanes 1 (plain
per-host window: the mega-host's whole pending set sorts in one task) vs 8
(salt-lane pre-prune: the heavy sort shrinks to ~lanes*budget rows per host),
each at two parallelism levels for the north rule's N->4N efficiency.

The pending frontier is synthesized deterministically from spark.range — no
driver-side rows, no external data. Usage:

    PYTHONPATH=/root/repo python tools/skew_bench.py [n_pending]

Prints one JSON line; the table in BASELINE.md "Measured (round 3)" is this
tool's output.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_service_spark.operators import politeness
from crawler_service_spark.session import get_spark

N_PENDING = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
N_SMALL_HOSTS = 191
HOST_BUDGET = 100  # << mega-host pending (~N/2): the adversarial regime
REPS = 2  # best-of-2 per cell (host noise; BASELINE.md round-1 note)


def pending_frame(spark):
    """~50% of rows on one mega-host, the rest uniform over 191 small hosts.

    Deterministic: every column is a hash/arith expression of the row id.
    """
    from pyspark.sql import functions as F

    ids = spark.range(N_PENDING)
    is_mega = F.pmod(F.xxhash64("id"), F.lit(2)) == 0
    host = F.when(is_mega, F.lit("mega000.example")).otherwise(
        F.concat(F.lit("host"), F.lpad(F.pmod("id", F.lit(N_SMALL_HOSTS)).cast("string"), 3, "0"), F.lit(".example"))
    )
    return ids.select(
        host.alias("host"),
        F.xxhash64("id", F.lit(1)).alias("url_hash"),
        F.pmod("id", F.lit(5)).cast("int").alias("depth"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100)).cast("int").alias("priority"),
        F.col("id").alias("seq"),
    )


def run_cell(cpus: int, lanes: int) -> dict:
    from pyspark.sql import functions as F

    spark = get_spark(f"skew-{cpus}-{lanes}", cpus=cpus, shuffle_partitions=cpus)
    # materialize frontier AND budgets once, untimed: the measured quantity
    # is the scheduler, not the synthetic-fixture generator (a lazy distinct
    # over the 8M-row frame would otherwise re-run inside every timed rep)
    budgets = (
        spark.range(N_SMALL_HOSTS)
        .select(
            F.concat(
                F.lit("host"), F.lpad(F.col("id").cast("string"), 3, "0"), F.lit(".example")
            ).alias("host")
        )
        .union(spark.range(1).select(F.lit("mega000.example").alias("host")))
        .withColumn("host_budget", F.lit(HOST_BUDGET))
        .cache()
    )
    budgets.count()
    pending = pending_frame(spark).cache()
    pending.count()
    best = None
    picked_n = picked_sum = None
    for _ in range(REPS):
        t0 = time.monotonic()
        picked = politeness.schedule(
            pending, budgets, iteration_seconds=1.0, salt_lanes=lanes
        )
        row = picked.agg(
            F.count("*").alias("n"), F.bit_xor("url_hash").alias("chk")
        ).collect()[0]
        wall = time.monotonic() - t0
        picked_n, picked_sum = int(row["n"]), int(row["chk"])
        best = wall if best is None else min(best, wall)
    spark.stop()
    return {
        "cpus": cpus,
        "salt_lanes": lanes,
        "wall_sec": round(best, 2),
        "pending_per_sec": round(N_PENDING / best, 1),
        "picked": picked_n,
        "picked_checksum": picked_sum,
    }


def main() -> None:
    cells = {}
    for lanes in (1, 8):
        for cpus in (2, 8):
            cell = run_cell(cpus, lanes)
            cells[f"lanes{lanes}_n{cpus}"] = cell
            print(json.dumps(cell), file=sys.stderr, flush=True)
    for lanes in (1, 8):
        lo, hi = cells[f"lanes{lanes}_n2"], cells[f"lanes{lanes}_n8"]
        cells[f"efficiency_lanes{lanes}"] = round(
            (hi["pending_per_sec"] / lo["pending_per_sec"]) / 4.0, 3
        )
    # invariance: salting must not change WHAT is picked, only how it's found
    # (row-set checksum, not just cardinality)
    assert cells["lanes1_n2"]["picked"] == cells["lanes8_n2"]["picked"]
    assert cells["lanes1_n2"]["picked_checksum"] == cells["lanes8_n2"]["picked_checksum"]
    print(json.dumps({
        "n_pending": N_PENDING,
        "mega_share": 0.5,
        "host_budget": HOST_BUDGET,
        **cells,
    }))


if __name__ == "__main__":
    main()
