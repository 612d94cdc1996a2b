"""robots.txt parsing — raw robots bodies -> the engine's rules table.

The north-star contract has the scheduler "enforcing robots.txt rules and
crawl-delay budgets"; the engine consumes rules as
``(host, path_prefix, allow, crawl_delay_s)`` (politeness.robots_filter /
host_budgets). This operator produces that table FROM raw robots.txt text
entirely with JVM built-ins — split + posexplode + a last-ignoring-nulls
window carries the "current User-agent block" state down the file, so the
sequential-looking grammar parses as a declarative plan (no UDF).

Grammar subset (the part the scheduler consumes): ``User-agent`` groups —
including RFC 9309 multi-agent groups, where several CONSECUTIVE
``User-agent`` lines share the rule block that follows them — with
``Allow``/``Disallow`` path prefixes, ``Crawl-delay`` seconds, ``#`` comments
and blank lines; only groups listing the ``*`` agent are honored. Empty
``Disallow:`` (allow-all idiom) emits an allow-rule for the root prefix.

At scale: one explode + three window passes per robots body, shuffle keyed by
host (uniform), output is tiny rule rows — the raw text never shuffles twice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_DELAY_S = 1.0


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """(host, robots_txt) -> (host, path_prefix, allow, crawl_delay_s)."""
    lines = robots.select(
        host_col,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "raw"),
    )
    # strip comments + whitespace; split 'Key: value'
    line = F.trim(F.regexp_replace(F.col("raw"), r"#.*$", ""))
    cleaned = lines.select(host_col, "line_no", line.alias("l"))
    key = F.lower(F.trim(F.substring_index(F.col("l"), ":", 1)))
    val = F.when(
        F.instr(F.col("l"), ":") > 0,
        F.trim(F.expr("substring(l, instr(l, ':') + 1)")),
    ).otherwise(F.lit(""))
    parsed = cleaned.select(
        host_col, "line_no", key.alias("key"), val.alias("val")
    ).filter(F.col("key") != "")

    # RFC 9309 grouping: a run of CONSECUTIVE User-agent lines opens one
    # group whose following rules apply to EVERY listed agent. A UA line
    # starts a new group only when the previous parsed line was not also a
    # UA line; a running sum of those starts numbers the groups, and the
    # group's agent set is collected over (host, group).
    w_seq = Window.partitionBy(host_col).orderBy("line_no")
    w_run = w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    is_ua = F.col("key") == "user-agent"
    prev_ua = F.coalesce(F.lag(is_ua).over(w_seq), F.lit(False))
    grouped = parsed.withColumn(
        "gid", F.sum((is_ua & ~prev_ua).cast("int")).over(w_run)
    )
    agents = F.collect_set(F.when(is_ua, F.col("val"))).over(
        Window.partitionBy(host_col, "gid")
    )
    sectioned = grouped.withColumn("agents", agents).filter(
        F.array_contains(F.col("agents"), agent)
    )

    # host-wide crawl delay from the agent's block (max if repeated)
    wd = Window.partitionBy(host_col)
    delay = F.max(
        F.when(F.col("key") == "crawl-delay", F.col("val").cast("double"))
    ).over(wd)
    rules = (
        sectioned.withColumn("crawl_delay_s", F.coalesce(delay, F.lit(DEFAULT_DELAY_S)))
        .filter(F.col("key").isin("allow", "disallow"))
        .select(
            F.col(host_col).alias("host"),
            # empty Disallow: == allow everything (standard idiom)
            F.when((F.col("key") == "disallow") & (F.col("val") == ""), F.lit(""))
            .otherwise(F.col("val"))
            .alias("path_prefix"),
            ((F.col("key") == "allow") | (F.col("val") == "")).alias("allow"),
            "crawl_delay_s",
        )
        .distinct()
    )
    return rules


def parse_sitemaps(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(host, robots_txt) -> DISTINCT (host, sitemap_url).

    ``Sitemap:`` directives are GLOBAL per the sitemaps.org protocol (and
    RFC 9309 treats lines outside known rules as belonging to no group), so
    extraction is a pure line scan with none of parse_robots' user-agent
    group machinery — the key is matched case-insensitively and the value
    keeps everything after the FIRST colon (sitemap URLs contain colons).
    Sitemap discovery feeds the frontier as seed URLs — the standard
    crawler bootstrap the reference's seed lists model by hand.

    Scale shape: explode lines -> filter -> distinct; one output-sized
    shuffle for the distinct, everything before it codegen."""
    lines = robots.select(
        host_col,
        F.explode(F.split(F.col(text_col), "\n")).alias("raw"),
    )
    cleaned = lines.select(
        host_col, F.trim(F.regexp_replace(F.col("raw"), r"#.*$", "")).alias("l")
    )
    key = F.lower(F.trim(F.substring_index(F.col("l"), ":", 1)))
    val = F.when(
        F.instr(F.col("l"), ":") > 0,
        F.trim(F.expr("substring(l, instr(l, ':') + 1)")),
    ).otherwise(F.lit(""))
    return (
        cleaned.select(F.col(host_col).alias("host"), key.alias("key"), val.alias("val"))
        .filter((F.col("key") == "sitemap") & (F.col("val") != ""))
        .select("host", F.col("val").alias("sitemap_url"))
        .distinct()
    )


def robots_filter_spec(
    candidates: DataFrame, rules: DataFrame, path_col: str = "path"
) -> DataFrame:
    """Google-spec precedence filter: the LONGEST matching rule governs, and
    Allow wins a length tie. Complements politeness.robots_filter (the
    engine's simpler any-disallow contract used by the crawl oracle).

    Plan: the verdict is a function of (host, path) alone, so it is decided
    once per DISTINCT key — broadcast the tiny rules table, theta-join on
    prefix match, argmax by (prefix length, allow) via one aggregation — and
    candidates keep their multiplicity through a left-semi join on the
    allowed keys. Every grouping key is a real column (no
    monotonically_increasing_id), so task retries / partition recomputation
    reproduce the identical result.
    """
    r = rules.select(
        F.col("host").alias("r_host"),
        F.col("path_prefix").alias("r_prefix"),
        F.col("allow").alias("r_allow"),
    ).distinct()
    keys = candidates.select("host", path_col).distinct()
    matched = keys.join(
        F.broadcast(r),
        (keys["host"] == F.col("r_host"))
        & keys[path_col].startswith(F.col("r_prefix")),
        "left",
    )
    verdict = F.max(
        F.struct(
            F.length(F.coalesce(F.col("r_prefix"), F.lit(""))).alias("l"),
            F.coalesce(F.col("r_allow"), F.lit(True)).alias("a"),
        )
    )
    decided = matched.groupBy("host", path_col).agg(verdict.alias("v"))
    allowed = decided.filter(F.col("v.a")).select("host", path_col)
    return candidates.join(allowed, on=["host", path_col], how="left_semi")


def robots_txt_col(disallow: Column, delay: Column) -> Column:
    """Deterministic robots.txt body builder (fixtures/tests/oracle twins).
    The ``*`` group is a multi-agent group (consecutive User-agent lines,
    RFC 9309) so the group parser's agent-set semantics are exercised."""
    return F.concat(
        F.lit("# synthetic robots\nUser-agent: googlebot\nDisallow: /only-google\n\n"),
        F.lit("User-agent: altbot\nUser-agent: *\nDisallow: "),
        disallow,
        F.lit("\nAllow: /pub\nCrawl-delay: "),
        delay.cast("string"),
        F.lit("\n"),
    )


# sitemap DOCUMENT parsing (the step after parse_sitemaps discovers the urls)
_URL_BLOCK = r"(?s)<url>(.*?)</url>"
_SITEMAP_BLOCK = r"(?s)<sitemap>(.*?)</sitemap>"
# loc content may be CDATA-wrapped; the wrapper is markup, not URL bytes
_LOC = r"(?s)<loc>\s*(?:<!\[CDATA\[)?\s*(.*?)\s*(?:\]\]>)?\s*</loc>"
_LASTMOD = r"(?s)<lastmod>\s*(.*?)\s*</lastmod>"


def _xml_unescape(c: Column) -> Column:
    """The five predefined XML entities, ``&amp;`` LAST so ``&amp;lt;``
    decodes to the literal ``&lt;`` the document escaped (sitemaps.org
    REQUIRES entity-escaped URLs, so ``?a=1&amp;b=2`` is the on-disk form
    of every multi-param URL; numeric character references are out of
    scope and documented as such)."""
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def parse_sitemap_xml(
    sitemaps: DataFrame,
    url_col: str = "sitemap_url",
    xml_col: str = "xml",
) -> DataFrame:
    """Fetched sitemap documents -> one row per referenced URL.

    Implements the two sitemaps.org document shapes:

    - ``<urlset>`` with ``<url><loc/><lastmod?/></url>`` entries ->
      ``is_index = false`` rows to seed the frontier;
    - ``<sitemapindex>`` with ``<sitemap><loc/><lastmod?/></sitemap>``
      entries -> ``is_index = true`` rows, child sitemaps that re-enter the
      FETCH queue (the same re-entry pattern as extracted archive members).

    lastmod is optional per entry, so loc/lastmod pair inside each entry
    block, never positionally across the document: blocks extract with one
    ``regexp_extract_all``, explode, and a per-block ``regexp_extract``
    picks each field — all JVM, ``(?s)`` for multi-line entries. loc values
    decode the five predefined XML entities (sitemaps.org mandates escaped
    URLs, so ``&amp;`` appears in every multi-param loc; numeric character
    references are not decoded) and shed an optional CDATA wrapper.
    lastmod '' (absent) maps to NULL and is taken verbatim (W3C datetimes
    never contain entities). Output: ``(sitemap_url, loc, lastmod,
    is_index)``; a plain-text sitemap (no <urlset>/<sitemapindex>) yields
    no rows.

    Scale shape: pure map stage (extract + two posexplode-free explodes),
    no shuffle at all; dedup/canonicalization belongs to the frontier-merge
    step that consumes the seeds."""
    x = F.col(xml_col).cast("string")

    def entries(block_pat: str, is_index: bool):
        blocks = F.regexp_extract_all(x, F.lit(block_pat), F.lit(1))
        return (
            sitemaps.select(
                F.col(url_col).alias("sitemap_url"),
                F.explode(blocks).alias("_b"),
            )
            .select(
                "sitemap_url",
                _xml_unescape(F.regexp_extract("_b", _LOC, 1)).alias("loc"),
                F.regexp_extract("_b", _LASTMOD, 1).alias("_lm"),
            )
            .filter(F.col("loc") != "")
            .select(
                "sitemap_url",
                "loc",
                F.when(F.col("_lm") != "", F.col("_lm")).alias("lastmod"),
                F.lit(is_index).alias("is_index"),
            )
        )

    return entries(_URL_BLOCK, False).unionByName(entries(_SITEMAP_BLOCK, True))
