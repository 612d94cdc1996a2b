"""CrawlEngine — the breadth-priority frontier-expansion loop.

Each iteration k is a pure DataFrame job over the snapshot of iteration k-1:

    (pending_{k-1}, seen_{k-1})
        -> politeness-rank (window top-budget per host, salted for skew)
        -> fetch (join against the pages table; misses -> dead-letter lineage)
        -> extract text (Arrow/pandas UDF, byte-exact) + outlinks (JVM regexp)
        -> robots filter -> in-batch first-occurrence dedup
        -> bloom fast-path + exact anti-join vs seen
        -> deterministic global seq assignment (distributed two-pass)
        -> commit pages_out / extraction_jobs / seen / bloom / pending_k /
           crawl_order / crawl_state   (crawl_state last = the checkpoint)

All reads are snapshot-anchored (``upto=...-iter-{k-1}``) and all commits are
idempotent by commit-id, so killing the job anywhere and calling ``resume()``
re-runs at most one iteration and converges to the identical state — the
engine's replacement for the reference's heartbeat + requeue retry machinery
(application.py:25-58,277-296) and its COMMITTING drain phase
(crawlers/globus_base_preserved.py:122-132,446-453).

Reference lifecycle parity: seed registration = ``push_to_pg``/``crawl_paths``
(crawlers/utils/crawler_utils.py:14-46); the iteration loop = the 8-thread
pop-list-enqueue workers (crawlers/globus_base_preserved.py:419-444,256-351);
termination = pending-empty, replacing the 10-empty-polls heuristic
(application.py:194-200).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.urls import canonicalize_url_col, host_col, path_col, url_hash_col
from .operators import politeness
from .operators.dedup import BloomSeenFilter, dedup_new_urls
from .operators.extraction import extract_links, extract_text
from .operators.grouping import emit_extraction_jobs
from .plans import with_global_seq
from .storage import ManifestCatalog

FRONTIER_COLS = [
    "crawl_id", "url", "url_hash", "host", "path",
    "depth", "priority", "seq", "discovered_iter",
]


@dataclass
class CrawlConfig:
    iteration_seconds: float = 30.0   # politeness budget window per iteration
    default_delay_s: float = 1.0
    global_cap: int | None = None     # optional cap on urls scheduled/iteration
    salt_lanes: int = 8               # host-skew salting for the rank window
    use_bloom: bool = True
    bloom_buckets: int = 64
    bloom_bits: int = 1 << 17
    emit_jobs: bool = True
    max_iterations: int = 10_000


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        robots: DataFrame,
        workdir: str,
        config: CrawlConfig | None = None,
    ):
        self.spark = spark
        self.config = config or CrawlConfig()
        self.catalog = ManifestCatalog(workdir, spark)
        # Pre-partition the page store by the join key once and keep it
        # materialized: every iteration's fetch-join then reuses that hash
        # partitioning instead of re-shuffling the (huge) pages side. On a real
        # cluster this is Iceberg bucketing on url_hash; here: cached repartition.
        p = int(spark.conf.get("spark.sql.shuffle.partitions"))
        self.pages = pages.repartition(p, "url").persist()
        self.robots = robots.persist()
        self.bloom = (
            BloomSeenFilter(
                self.catalog,
                n_buckets=self.config.bloom_buckets,
                m_bits=self.config.bloom_bits,
            )
            if self.config.use_bloom
            else None
        )

    # ------------------------------------------------------------------ state
    def last_state(self) -> dict | None:
        st = self.catalog.read("crawl_state")
        if st is None:
            return None
        row = st.orderBy(F.desc("iteration")).limit(1).collect()
        return row[0].asDict() if row else None

    def _empty(self, schema: str) -> DataFrame:
        return self.spark.createDataFrame([], schema)

    # ------------------------------------------------------------------- seed
    def seed(self, seeds: DataFrame) -> None:
        """Register the seed list as iteration 0 (reference: POST /crawl ->
        crawl_paths rows + initial frontier, application.py:101-153)."""
        s = seeds.select(
            "crawl_id",
            canonicalize_url_col("url").alias("url"),
            F.col("seed_order").cast("long").alias("seed_order"),
        )
        s = (
            s.withColumn("host", host_col("url"))
            .withColumn("path", path_col("url"))
            .withColumn("url_hash", url_hash_col("url"))
        )
        s = politeness.robots_filter(s, self.robots)
        s = s.groupBy("crawl_id", "url", "url_hash", "host", "path").agg(
            F.min("seed_order").alias("seed_order")
        )
        s = with_global_seq(s, [F.col("seed_order").asc()], seq_col="seq", start=0)
        frontier = s.select(
            "crawl_id", "url", "url_hash", "host", "path",
            F.lit(0).alias("depth"), F.lit(0).alias("priority"),
            "seq", F.lit(0).alias("discovered_iter"),
        )
        frontier = frontier.localCheckpoint(eager=True)
        n = frontier.count()
        self.catalog.commit("frontier_pending", frontier, "pending-iter-0", mode="overwrite")
        self.catalog.commit(
            "seen",
            frontier.select("url_hash", "url", "host", "depth", "seq", "discovered_iter"),
            "seen-iter-0",
        )
        if self.bloom:
            self.bloom.update(frontier.select("url"), "bloom-iter-0")
        state = self.spark.createDataFrame(
            [(self._crawl_id(frontier), 0, "running", 0, 0, 0, n, n, int(n), 0, 0, 0)],
            "crawl_id string, iteration int, status string, scheduled long, "
            "fetched long, failed long, new_urls long, frontier_pending long, "
            "next_seq long, families long, bytes_crawled long, wall_ms long",
        )
        self.catalog.commit("crawl_state", state, "state-iter-0")

    @staticmethod
    def _crawl_id(df: DataFrame) -> str:
        r = df.select("crawl_id").limit(1).collect()
        return r[0][0] if r else "crawl-unknown"

    # -------------------------------------------------------------- iteration
    def run_iteration(self, k: int) -> dict:
        t0 = time.monotonic()
        cfg = self.config
        prev = f"iter-{k - 1}"
        pending = self.catalog.read("frontier_pending", upto=f"pending-{prev}")
        assert pending is not None, f"no pending snapshot for iteration {k - 1}"
        seen = self.catalog.read("seen", upto=f"seen-{prev}")
        st = self.last_state()
        next_seq = int(st["next_seq"])
        fam_seq = int(st["families"])

        budgets = politeness.host_budgets(self.robots, cfg.iteration_seconds)
        scheduled = politeness.schedule(
            pending, budgets, cfg.iteration_seconds,
            default_delay_s=cfg.default_delay_s,
            global_cap=cfg.global_cap, salt_lanes=cfg.salt_lanes,
        ).localCheckpoint(eager=True)

        fetched = scheduled.join(self.pages, on="url", how="left")
        ok = fetched.filter(F.col("html").isNotNull()).localCheckpoint(eager=True)
        failures = fetched.filter(F.col("html").isNull()).select(
            "crawl_id", F.lit(k).alias("iteration"), "url", F.lit("not_found").alias("reason")
        )

        pages_out = ok.select(
            "crawl_id", F.lit(k).alias("iteration"), "url", "seq", "depth", "host",
            "lang", F.length("html").cast("long").alias("size"),
            extract_text(F.col("html")).alias("text"),
        )

        links = extract_links(
            ok.select(
                "crawl_id",
                F.col("seq").alias("parent_seq"),
                F.col("depth").alias("parent_depth"),
                F.col("priority").alias("parent_priority"),
                "html",
            )
        )
        cand = links.select(
            "crawl_id", "parent_seq", "parent_depth", "parent_priority", "link_idx",
            canonicalize_url_col("href").alias("url"),
        ).filter(F.col("url").rlike(r"^https?://"))
        cand = (
            cand.withColumn("host", host_col("url"))
            .withColumn("path", path_col("url"))
            .withColumn("url_hash", url_hash_col("url"))
        )
        cand = politeness.robots_filter(cand, self.robots)

        # in-batch first-occurrence dedup: keep the earliest discoverer in the
        # oracle's FIFO processing order (parent_depth, -parent_priority,
        # parent_seq, link_idx) — min over a sortable struct.
        okey = F.struct(
            F.col("parent_depth").alias("pd"),
            (-F.col("parent_priority")).alias("pnp"),
            F.col("parent_seq").alias("ps"),
            F.col("link_idx").alias("li"),
        )
        firsts = cand.groupBy("crawl_id", "url", "url_hash", "host", "path").agg(
            F.min(okey).alias("okey")
        )
        new = dedup_new_urls(firsts, seen, self.bloom, bloom_upto=f"bloom-{prev}")
        new = new.select(
            "crawl_id", "url", "url_hash", "host", "path",
            (F.col("okey.pd") + 1).alias("depth"),
            F.lit(0).alias("priority"),
            F.col("okey.pd").alias("_pd"), F.col("okey.pnp").alias("_pnp"),
            F.col("okey.ps").alias("_ps"), F.col("okey.li").alias("_li"),
        )
        new = with_global_seq(
            new,
            [F.col("_pd").asc(), F.col("_pnp").asc(), F.col("_ps").asc(), F.col("_li").asc()],
            seq_col="seq",
            start=next_seq,
        ).drop("_pd", "_pnp", "_ps", "_li")
        new_frontier = new.select(
            *[c for c in FRONTIER_COLS if c != "discovered_iter"],
            F.lit(k).alias("discovered_iter"),
        ).localCheckpoint(eager=True)

        next_pending = pending.join(
            scheduled.select("url"), on="url", how="left_anti"
        ).select(*FRONTIER_COLS).unionByName(new_frontier.select(*FRONTIER_COLS))
        next_pending = next_pending.localCheckpoint(eager=True)

        # ---- metrics (before commits so state row is complete) ----
        n_sched = scheduled.count()
        n_ok = ok.count()
        n_new = new_frontier.count()
        n_pending = next_pending.count()
        bytes_crawled = ok.agg(F.sum(F.length("html"))).collect()[0][0] or 0

        # ---- commits (idempotent; crawl_state last = checkpoint marker) ----
        it = f"iter-{k}"
        self.catalog.commit("pages_out", pages_out, f"pages-{it}")
        self.catalog.commit("fetch_failures", failures, f"fail-{it}")
        n_fams = 0
        if cfg.emit_jobs:
            jobs = emit_extraction_jobs(
                ok.select("crawl_id", "url", "seq", "html"), k, seq_start=fam_seq
            ).localCheckpoint(eager=True)
            n_fams = jobs.count()
            self.catalog.commit("extraction_jobs", jobs, f"jobs-{it}")
        self.catalog.commit(
            "seen",
            new_frontier.select("url_hash", "url", "host", "depth", "seq", "discovered_iter"),
            f"seen-{it}",
        )
        if self.bloom:
            self.bloom.update(new_frontier.select("url"), f"bloom-{it}", upto=f"bloom-{prev}")
        self.catalog.commit("frontier_pending", next_pending, f"pending-{it}", mode="overwrite")
        self.catalog.commit(
            "crawl_order",
            scheduled.select(
                "crawl_id", F.lit(k).alias("iteration"),
                "seq", "depth", "priority", "url", "host",
            ),
            f"order-{it}",
        )
        status = "running" if n_pending > 0 else "complete"
        wall_ms = int((time.monotonic() - t0) * 1000)
        state = self.spark.createDataFrame(
            [(
                str(st["crawl_id"]), k, status, n_sched, n_ok, n_sched - n_ok,
                n_new, n_pending, next_seq + n_new, fam_seq + n_fams,
                int(bytes_crawled), wall_ms,
            )],
            "crawl_id string, iteration int, status string, scheduled long, "
            "fetched long, failed long, new_urls long, frontier_pending long, "
            "next_seq long, families long, bytes_crawled long, wall_ms long",
        )
        self.catalog.commit("crawl_state", state, f"state-{it}")
        return {
            "iteration": k, "scheduled": n_sched, "fetched": n_ok,
            "new_urls": n_new, "pending": n_pending, "status": status,
            "wall_ms": wall_ms,
        }

    # -------------------------------------------------------------------- run
    def run(self, seeds: DataFrame | None = None, max_iterations: int | None = None) -> list[dict]:
        """Run (or resume) the crawl until the frontier drains."""
        if seeds is not None and self.last_state() is None:
            self.seed(seeds)
        st = self.last_state()
        assert st is not None, "no checkpoint and no seeds given"
        if st["status"] == "complete":
            return []
        stats = []
        k = int(st["iteration"]) + 1
        limit = max_iterations or self.config.max_iterations
        for _ in range(limit):
            s = self.run_iteration(k)
            stats.append(s)
            if s["status"] == "complete":
                break
            k += 1
        return stats

    resume = run  # resuming IS running: the checkpoint decides where to start
