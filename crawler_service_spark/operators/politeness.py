"""Per-host politeness scheduler — window-ranked priority queues.

The reference throttles globally (8 crawl threads, SQS batches of 10, 1-5 s
idle jitter; crawlers/globus_base_preserved.py:23,139,248-249). This engine
makes politeness *semantic and per-host*:

- every host gets a budget of ``max(1, floor(iteration_seconds / crawl_delay))``
  URLs per iteration (robots Crawl-delay; FIXTURES.md §3);
- robots Disallow prefixes filter candidates before they ever enter the
  frontier (reference ``skip_lookup`` analogue, application.py:119-124);
- breadth-priority order = ``(depth ASC, priority DESC, seq ASC)`` — ``seq`` is
  the deterministic FIFO discovery position, so ranking reproduces the
  reference's queue-BFS order (crawlers/globus_base_preserved.py:427-428,256)
  exactly, independent of cluster size.

Scale notes (the part that must survive 10^10 URLs with Zipf hosts):
- ``rank()`` over ``partitionBy(host)`` alone would sort a mega-host's entire
  pending set in one task. We pre-prune with a salted two-stage top-k:
  rank within ``(host, salt)`` where ``salt = pmod(url_hash, S)``, keep the
  top-budget of each salt lane (a superset of the true top-budget), then rank
  the ≤ S*budget survivors per host. The heavy sort shrinks by ~frontier/budget.
- the optional global cap is ``orderBy(...).limit(n)`` which Spark executes as
  TakeOrderedAndProject (per-partition top-n + driver merge), never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

def order_cols() -> list:
    """Breadth-priority total order: (depth ASC, priority DESC, seq ASC)."""
    return [F.col("depth").asc(), F.col("priority").desc(), F.col("seq").asc()]


def disallow_rules(robots: DataFrame) -> DataFrame:
    return (
        robots.filter((~F.col("allow")) & (F.col("path_prefix") != ""))
        .select("host", "path_prefix")
        .distinct()
    )


def robots_filter(candidates: DataFrame, robots: DataFrame) -> DataFrame:
    """Drop candidates matching any Disallow prefix for their host.

    Broadcast left-anti join on host with a startswith theta-condition — the
    rules table is tiny (one row per (host, prefix)), so this never shuffles
    the candidate side.
    """
    rules = disallow_rules(robots).withColumnsRenamed(
        {"host": "r_host", "path_prefix": "r_prefix"}
    )
    return candidates.join(
        F.broadcast(rules),
        (candidates["host"] == F.col("r_host"))
        & candidates["path"].startswith(F.col("r_prefix")),
        "left_anti",
    )


def host_budgets(robots: DataFrame, iteration_seconds: float) -> DataFrame:
    """One row per host: scheduling budget for an iteration."""
    return (
        robots.groupBy("host")
        .agg(F.max("crawl_delay_s").alias("crawl_delay_s"))
        .select(
            "host",
            F.greatest(
                F.lit(1),
                F.floor(F.lit(float(iteration_seconds)) / F.col("crawl_delay_s")),
            )
            .cast("int")
            .alias("host_budget"),
        )
    )


def schedule(
    pending: DataFrame,
    budgets: DataFrame,
    iteration_seconds: float,
    default_delay_s: float = 1.0,
    global_cap: int | None = None,
    salt_lanes: int = 8,
) -> DataFrame:
    """Pick this iteration's crawl batch: per-host top-budget in breadth order.

    Deterministic under any parallelism: the order key (depth, priority, seq)
    is a total order because ``seq`` is unique.
    """
    default_budget = max(1, int(iteration_seconds / default_delay_s))
    p = pending.join(F.broadcast(budgets), "host", "left").withColumn(
        "host_budget", F.coalesce(F.col("host_budget"), F.lit(default_budget))
    )

    if salt_lanes > 1:
        lane = Window.partitionBy("host", F.pmod(F.col("url_hash"), F.lit(salt_lanes))).orderBy(*order_cols())
        p = (
            p.withColumn("__lane_rn", F.row_number().over(lane))
            .filter(F.col("__lane_rn") <= F.col("host_budget"))
            .drop("__lane_rn")
        )

    per_host = Window.partitionBy("host").orderBy(*order_cols())
    picked = (
        p.withColumn("__rn", F.row_number().over(per_host))
        .filter(F.col("__rn") <= F.col("host_budget"))
        .drop("__rn", "host_budget")
    )
    if global_cap is not None:
        picked = picked.orderBy(*order_cols()).limit(int(global_cap))
    return picked
