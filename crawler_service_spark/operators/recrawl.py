"""Recrawl scheduling from observed change rates — the freshness loop.

A production crawler does not refetch every URL at the same cadence: it
estimates each page's change frequency from its fetch history (Cho &
Garcia-Molina, "Estimating Frequency of Change") and books the next fetch
accordingly — news front pages hourly, static docs monthly. The reference
crawls each tree once per submission (legacy/posix_crawler.py loop);
this operator is the standing-service extension every long-running crawl
deployment adds on top.

Input: one row per fetch observation (url key, timestamp, and a content
signature — a hash or any change-sensitive token). Per URL, observations
are ordered and a "change" counted whenever the signature differs from the
previous observation's; the integer change rate (permille of adjacent
observation pairs that changed) maps through fixed tier thresholds to a
revisit interval, and ``next_fetch_epoch_s = last_seen + interval``.

Scale shape: ONE shuffle on the (uniform) URL key — the lag window and the
per-URL rollup share the same hash partitioning, so Spark plans a single
Exchange (same claim as sessionize, plan-audited). The tier map is a
literal CASE chain: no join, no driver state. Integer arithmetic
end-to-end (truncating div, epoch seconds), so the DuckDB twin matches
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# (min change_permille, revisit interval seconds): hot pages hourly,
# changing pages daily, slow pages weekly, static pages monthly
DEFAULT_TIERS: tuple[tuple[int, int], ...] = (
    (800, 3_600),
    (400, 86_400),
    (100, 604_800),
    (0, 2_592_000),
)


def recrawl_schedule(
    observations: DataFrame,
    url_col: str = "url_id",
    ts_col: str = "ts",
    sig_col: str = "content_sig",
    order_col: str = "obs_id",
    tiers: tuple[tuple[int, int], ...] = DEFAULT_TIERS,
) -> DataFrame:
    """Per-URL change-rate estimate and next-fetch booking.

    ``order_col`` breaks timestamp ties so the observation sequence is a
    total order (same contract as sessionization). Returns one row per URL:
    ``n_obs``, ``n_changes``, ``change_permille`` (0 for single-observation
    URLs — no pair to compare), ``revisit_s`` (the booked interval), and
    ``next_fetch_epoch_s``.
    """
    ts = F.col(ts_col).cast("timestamp").cast("long")
    d = observations.select(
        F.col(url_col).alias("url_id"),
        ts.alias("t"),
        F.col(sig_col).alias("sig"),
        F.col(order_col).alias("o"),
    )
    w = Window.partitionBy("url_id").orderBy("t", "o")
    prev = F.lag("sig").over(w)
    # null-SAFE compare (<=>), gated on row_number to tell "first row" apart
    # from "previous signature was NULL": a failed fetch recorded with a
    # NULL sig both counts as a change from 'a' and is changed-from by the
    # next 'a' — `sig != prev` would NULL out both pairs and book a
    # flapping URL into the static monthly tier.
    lagged = d.withColumn(
        "chg",
        F.when(
            (F.row_number().over(w) > 1) & ~F.col("sig").eqNullSafe(prev), 1
        ).otherwise(0),
    )
    agg = lagged.groupBy("url_id").agg(
        F.count("*").cast("long").alias("n_obs"),
        F.sum("chg").cast("long").alias("n_changes"),
        F.max("t").alias("last_seen_epoch_s"),
    )
    rate = F.when(
        F.col("n_obs") > 1,
        F.expr("div(1000 * n_changes, n_obs - 1)"),
    ).otherwise(F.lit(0))
    agg = agg.withColumn("change_permille", rate.cast("long"))
    # fallback (change_permille below every threshold) = the LOWEST tier's
    # interval — the coldest booking. tiers[-1][1] would read whatever the
    # caller listed last: for ascending custom tiers without a 0 threshold
    # that is the hottest interval, handed to the most static page.
    ordered = sorted(tiers)
    interval = F.lit(int(ordered[0][1]))
    for threshold, seconds in ordered:  # ascending: highest wins last
        interval = F.when(
            F.col("change_permille") >= int(threshold), F.lit(int(seconds))
        ).otherwise(interval)
    return agg.select(
        "url_id",
        "n_obs",
        "n_changes",
        "change_permille",
        interval.cast("long").alias("revisit_s"),
        (F.col("last_seen_epoch_s") + interval).cast("long").alias(
            "next_fetch_epoch_s"
        ),
    )
