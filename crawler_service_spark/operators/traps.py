"""Spider-trap / URL-explosion detection (crawl-side frontier defense).

The reference crawler bounds per-host work with its skip rules and batch
caps (ref application.py:119-124 skip_lookup; per-batch caps,
crawlers/globus_base_preserved.py) but has no structural defense against
URL-space explosions: calendar pages, session-id query strings, and
self-linking path cycles mint unbounded *distinct* URLs under one host, so
dedup never fires and the politeness lane's budget drains into the trap
forever. Production crawlers all grow this defense (Heritrix's
PathologicalPath / TooManyPathSegments decide rules, Nutch's regex URL
filters); at a 10^10-URL frontier it is load-bearing.

Detection here is structural and integer-exact, from the URL strings alone:

- **Template collapse** — a path maps to a template by lowercasing, folding
  hex runs of >=8 chars to ``@`` and then digit runs to ``#``. Trap hosts
  mint unbounded URLs from a handful of templates, so the
  ``urls/templates`` ratio explodes (``..._permille`` columns, truncating
  integer division, same convention as the rest of the repo).
- **Path cycles** — a path repeating one segment ``cycle_repeat`` times
  (``/a/b/a/b/a/b``) is the classic relative-link loop.
- **Depth** — max path-segment count per host (TooManyPathSegments).
- **Query-id explosion** — many distinct query strings over few distinct
  query *key sets* means the values (session ids, timestamps) are the
  explosion, not the pages.

Scale shape: ``host_trap_stats`` is per-row JVM expression work (no UDFs)
into ONE groupBy(host) — output bounded by |hosts|. The multi-distinct agg
expands the shuffle rows by the number of distinct aggregates; acceptable
because the grouped frame is the frontier slice, not the corpus, and the
output is host-bounded. ``cap_per_template`` is the actionable arm and is
deliberately NOT a single row_number window: the partitions that matter are
exactly the skewed ones (a trap template holds millions of rows), so the cap
runs as the salted two-phase top-k — per-(host, template, salt) smallest-k,
then smallest-k of the <= salt*k survivors — both phases sort-based and
spillable, no reducer ever sees a whole trap template. Survivors are the k
lexicographically-smallest canonical URLs, a total order, so any
parallelism (and any salt) keeps the same set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.urls import canonicalize_url_col, host_col, path_col

# defaults: a host is suspicious when it averages >=10 distinct URLs per
# template (10_000 permille) over at least 32 URLs — small multi-page
# listings stay well under both.
DEFAULT_RATIO_PERMILLE = 10_000
DEFAULT_MIN_URLS = 32
DEFAULT_MAX_DEPTH = 32
DEFAULT_CYCLE_REPEAT = 3


def _permille(num_col: str, den_col: str) -> Column:
    """``div(1000 * num, den)`` — the repo's exact integer permille idiom,
    shared by the census report and the enforcement rollup so the two can
    never diverge. Caller guards den > 0 (ANSI div-by-zero raises)."""
    return F.expr(f"div(1000 * {num_col}, {den_col})")


def template_col(path: Column) -> Column:
    """Path template: lowercase, hex runs (>=8) -> '@', digit runs -> '#'.

    Hex folds FIRST, so a long pure-digit run (>=8) reads as an id ('@'),
    not a number — deterministic on both engines since the character
    classes mean the same in Java and Python regex."""
    t = F.lower(path)
    t = F.regexp_replace(t, r"[0-9a-f]{8,}", "@")
    return F.regexp_replace(t, r"[0-9]+", "#")


def _url_features(
    df: DataFrame, url_col: str, assume_canonical: bool
) -> DataFrame:
    """Per-row derived columns, all JVM built-ins: canonical url, host,
    query-less path, template, depth, max segment multiplicity, query
    string + sorted query key set. Rows with no parseable host drop."""
    curl = (
        F.col(url_col) if assume_canonical else canonicalize_url_col(url_col)
    )
    d = df.select(curl.alias("curl"))
    d = d.select(
        "curl",
        host_col("curl").alias("host"),
        path_col("curl").alias("fullpath"),
    ).filter(F.col("host") != "")
    d = d.select(
        "curl",
        "host",
        F.substring_index("fullpath", "?", 1).alias("path"),
        F.when(
            F.instr("fullpath", "?") > 0,
            F.expr("substring(fullpath, instr(fullpath, '?') + 1)"),
        ).alias("query"),  # NULL when there is no query (countDistinct skips)
    )
    segs = F.filter(F.split("path", "/"), lambda s: s != "")
    return d.select(
        "curl",
        "host",
        template_col(F.col("path")).alias("template"),
        F.size(segs).alias("depth"),
        F.coalesce(
            F.array_max(
                F.transform(
                    F.array_distinct(segs),
                    lambda u: F.size(F.filter(segs, lambda s: s == u)),
                )
            ),
            F.lit(0),
        ).alias("seg_repeat"),
        "query",
        F.when(
            F.col("query").isNotNull(),
            F.concat_ws(
                "&",
                F.array_sort(
                    F.array_distinct(
                        F.transform(
                            F.split("query", "&"),
                            lambda kv: F.substring_index(kv, "=", 1),
                        )
                    )
                ),
            ),
        ).alias("keyset"),
    )


def host_trap_stats(
    df: DataFrame,
    url_col: str = "url",
    assume_canonical: bool = False,
    ratio_permille: int = DEFAULT_RATIO_PERMILLE,
    min_urls: int = DEFAULT_MIN_URLS,
    max_depth: int = DEFAULT_MAX_DEPTH,
    cycle_repeat: int = DEFAULT_CYCLE_REPEAT,
) -> DataFrame:
    """Per-host explosion census + trap flags. One groupBy(host); output
    bounded by |hosts|.

    Columns: ``host, urls, templates, urls_per_template_permille, depth_max,
    seg_repeat_max, queries, keysets, queries_per_keyset_permille,
    trap_template, trap_cycle, trap_depth, trap_query, trap``."""
    feats = _url_features(df, url_col, assume_canonical)
    stats = feats.groupBy("host").agg(
        F.countDistinct("curl").alias("urls"),
        F.countDistinct("template").alias("templates"),
        F.max("depth").alias("depth_max"),
        F.max("seg_repeat").alias("seg_repeat_max"),
        F.countDistinct("query").alias("queries"),
        F.countDistinct("keyset").alias("keysets"),
    )
    stats = stats.select(
        "*",
        # _permille = SQL div(): exact integer floor. templates >= 1 always
        # (every grouped row carries one); keysets can be 0 (query-less
        # host), guarded like recrawl's n_obs > 1 because div-by-zero
        # raises under ANSI mode
        _permille("urls", "templates").alias("urls_per_template_permille"),
        F.when(F.col("keysets") > 0, _permille("queries", "keysets"))
        .otherwise(F.lit(0))
        .alias("queries_per_keyset_permille"),
    )
    return stats.select(
        "host",
        "urls",
        "templates",
        "urls_per_template_permille",
        "depth_max",
        "seg_repeat_max",
        "queries",
        "keysets",
        "queries_per_keyset_permille",
        (
            (F.col("urls_per_template_permille") >= ratio_permille)
            & (F.col("urls") >= min_urls)
        ).alias("trap_template"),
        (F.col("seg_repeat_max") >= cycle_repeat).alias("trap_cycle"),
        (F.col("depth_max") > max_depth).alias("trap_depth"),
        (
            (F.col("queries_per_keyset_permille") >= ratio_permille)
            & (F.col("queries") >= min_urls)
        ).alias("trap_query"),
    ).select(
        "*",
        (
            F.col("trap_template")
            | F.col("trap_cycle")
            | F.col("trap_depth")
            | F.col("trap_query")
        ).alias("trap"),
    )


def trap_hosts(stats: DataFrame) -> DataFrame:
    """Hosts to quarantine — feed to a broadcast anti-join against the
    frontier, the same shape as the skip-list predicate (F2)."""
    return stats.filter(F.col("trap")).select("host")


def cap_per_template(
    df: DataFrame,
    url_col: str = "url",
    k: int = 100,
    assume_canonical: bool = False,
    salt: int = 64,
) -> DataFrame:
    """Keep at most ``k`` distinct canonical URLs per (host, template): the
    k lexicographically-smallest. Healthy hosts (templates with <= k pages)
    pass through whole; exploding templates lose their tail.

    Exact and skew-safe: phase 1 ranks within (host, template,
    xxhash64(url) % salt) — a trap template's rows split across ``salt``
    sort-spillable cells — phase 2 re-ranks the <= salt*k survivors. Both
    phases use ``dense_rank`` so duplicate frontier rows for one canonical
    URL share a rank (the k smallest DISTINCT urls survive), and the
    dedup then runs on the capped output, not the corpus: the only
    corpus-wide exchange is phase 1's.
    Output: ``(host, template, url)`` with ``url`` canonical, distinct.
    """
    feats = _url_features(df, url_col, assume_canonical).select(
        "host", "template", F.col("curl").alias("url")
    )
    cell = F.pmod(F.xxhash64("url"), F.lit(salt))
    w1 = Window.partitionBy("host", "template", cell).orderBy("url")
    w2 = Window.partitionBy("host", "template").orderBy("url")
    return (
        feats.withColumn("_r", F.dense_rank().over(w1))
        .filter(F.col("_r") <= k)
        .withColumn("_r", F.dense_rank().over(w2))
        .filter(F.col("_r") <= k)
        .select("host", "template", "url")
        .distinct()
    )


# --------------------------------------------------------------------------- #
# incremental stats (the engine-integrated form: state in the catalog)
# --------------------------------------------------------------------------- #

TRAP_STATS_SCHEMA = "host string, template string, n bigint"


def template_delta(
    df: DataFrame, url_col: str = "url", assume_canonical: bool = True
) -> DataFrame:
    """(host, template, n) census of ONE batch of distinct URLs.

    The engine feeds each canonical URL exactly once per residence in the
    seen set (new_frontier rows have passed the seen anti-join; seeds are
    censused at iteration 0; forget-expiry appends NEGATIVE deltas for the
    urls it removes), so the appended (host, template, n) rows stay
    ADDITIVE: their sum at read time equals the exact
    distinct-URL-per-template counts of the CURRENT seen set without ever
    rescanning it — an O(|batch|) census per iteration instead of an
    O(|seen|) one, which is what makes the guard affordable at a 10^10-URL
    frontier. One template-bounded groupBy shuffle per batch."""
    feats = _url_features(df, url_col, assume_canonical)
    return feats.groupBy("host", "template").agg(F.count(F.lit(1)).alias("n"))


def flagged_hosts_from_deltas(
    deltas: DataFrame,
    ratio_permille: int = DEFAULT_RATIO_PERMILLE,
    min_urls: int = DEFAULT_MIN_URLS,
) -> DataFrame:
    """Hosts whose cumulative urls/templates ratio trips the explosion flag.

    Input is the trap-stats delta table (any number of appended batches);
    the rollup runs over a template-bounded frame — one small groupBy, no
    corpus access. Same thresholds and integer math as `host_trap_stats`."""
    per_template = (
        deltas.groupBy("host", "template")
        .agg(F.sum("n").alias("n"))
        # forget-expiry appends negative deltas; a template whose urls all
        # left the seen set must not count toward the template total
        .filter(F.col("n") > 0)
    )
    per_host = per_template.groupBy("host").agg(
        F.sum("n").alias("urls"), F.count(F.lit(1)).alias("templates")
    )
    return per_host.filter(
        (_permille("urls", "templates") >= ratio_permille)
        & (F.col("urls") >= min_urls)
    ).select("host")
