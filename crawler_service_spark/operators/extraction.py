"""Fetch-stage extraction: outlinks + byte-exact text.

The reference's "fetch" is a directory listing + per-entry metadata build inside
worker threads / funcX batches (crawlers/globus_base_preserved.py:271-351,
crawlers/local_funcx.py:122-169). Here the fetch result is the ``pages`` table
row; extraction splits into:

- **link extraction** — JVM-side ``regexp_extract_all`` over the html bytes
  (whole-stage codegen; one input row -> many link rows via posexplode, the
  UDTF shape of the reference's funcX ``{'metadata': [...], 'next_dirs': [...]}``
  return, crawlers/local_funcx.py:99-119);
- **text extraction** — a vectorized Arrow/pandas UDF (never per-row Python)
  whose output must be byte-identical to the stored ``text`` ground truth
  (BASELINE.json input_hint). The rule is fixed: title + "\\n" + first <p>.

The decompress-recursion of the reference (legacy/decompressor.py:13-75 — unzip
then re-scan children) maps to frontier re-entry: extracted links simply become
next-iteration frontier rows.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

HREF_PATTERN = r'href="([^"]+)"'


def extract_hrefs(html) -> "F.Column":
    """Array of hrefs in document order (JVM regexp; null html -> null array,
    which a later posexplode silently skips — the dead-letter branch handles
    fetch misses)."""
    h = F.col(html) if isinstance(html, str) else html
    return F.regexp_extract_all(h.cast("string"), F.lit(HREF_PATTERN), F.lit(1))


def extract_links(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """One row per (page, link_idx, href), in document order."""
    return pages.select(
        "*", F.posexplode(extract_hrefs(html_col)).alias("link_idx", "href")
    ).drop(html_col)


@pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """Vectorized extraction: '<title>…</title>' + '\\n' + first '<p>…</p>'.

    Pure pandas str ops on the whole Arrow batch — the plug-in point for
    ARBITRARY Python extractors (the reference ships extraction as a funcX
    Python callable, crawlers/local_funcx.py:122-169, so the engine keeps a
    pandas-UDF seam). The built-in rule itself is also regexp-expressible, so
    the crawl hot path uses the JVM twin ``extract_text_col`` below — same
    bytes (tests enforce 3-way equality), no Arrow round-trip of the html.
    """
    s = html.str.decode("utf-8")
    title = s.str.extract(r"<title>(.*?)</title>", expand=False).fillna("")
    para = s.str.extract(r"<p>(.*?)</p>", expand=False).fillna("")
    return (title + "\n" + para).where(html.notna(), None)


def extract_text_col(html) -> "F.Column":
    """JVM twin of ``extract_text`` (whole-stage codegen, no Python round
    trip): regexp_extract returns '' on no-match, exactly like the pandas
    fillna('') — byte-identical output. Java and Python regex agree on these
    patterns (non-greedy, dot excludes newlines in both)."""
    h = (F.col(html) if isinstance(html, str) else html).cast("string")
    title = F.regexp_extract(h, r"<title>(.*?)</title>", 1)
    para = F.regexp_extract(h, r"<p>(.*?)</p>", 1)
    return F.concat(title, F.lit("\n"), para)


def extract_text_py(html: bytes) -> str:
    """Pure-Python twin of ``extract_text`` for the oracle crawler."""
    import re

    s = html.decode("utf-8")
    mt = re.search(r"<title>(.*?)</title>", s)
    mp = re.search(r"<p>(.*?)</p>", s)
    return (mt.group(1) if mt else "") + "\n" + (mp.group(1) if mp else "")


# --------------------------------------------------------------------------- #
# anchor text (the link-context signal the href extractor drops)
# --------------------------------------------------------------------------- #

# same href core as HREF_PATTERN, extended to capture the anchor's first text
# run; group 1 = href, group 2 = anchor text up to the next tag
ANCHOR_PATTERN = r'<a\s[^>]*href="([^"]+)"[^>]*>([^<]*)'


def extract_anchor_pairs(html) -> "F.Column":
    """``array<struct<href, anchor>>`` in document order, JVM-side.

    The reference extracts hrefs only (HREF_RE over the page body); anchor
    text is the classic web relevance/quality signal a corpus pipeline wants
    alongside the link graph. Two ``regexp_extract_all`` passes over the SAME
    pattern (group 1, group 2) stay index-aligned structurally, so the zip
    needs no positional join. Null html -> null array, like
    ``extract_hrefs``."""
    h = (F.col(html) if isinstance(html, str) else html).cast("string")
    hrefs = F.regexp_extract_all(h, F.lit(ANCHOR_PATTERN), F.lit(1))
    texts = F.regexp_extract_all(h, F.lit(ANCHOR_PATTERN), F.lit(2))
    return F.zip_with(
        hrefs, texts, lambda u, t: F.struct(u.alias("href"), t.alias("anchor"))
    )


def extract_anchor_links(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """One row per (page, link_idx, href, anchor), in document order — the
    anchor-carrying twin of ``extract_links``."""
    return pages.select(
        "*", F.posexplode(extract_anchor_pairs(html_col)).alias("link_idx", "_a")
    ).select(
        *[c for c in pages.columns if c != html_col],
        "link_idx",
        F.col("_a.href").alias("href"),
        F.col("_a.anchor").alias("anchor"),
    )


def anchor_text_topk(
    links: DataFrame,
    k: int = 5,
    dst_col: str = "href",
    anchor_col: str = "anchor",
) -> DataFrame:
    """Per-target top-k anchor texts by reference count — how the web
    describes each URL (the signal search stacks and quality classifiers
    aggregate per target).

    Anchors normalize: lowercase, ASCII whitespace runs (space/tab/CR/LF/
    FF/VT — collapsed FIRST, so F.trim's space-only strip then removes any
    edge run; Java \\s is ASCII while Python's is Unicode, so the class is
    explicit and the twin mirrors it — U+00A0 etc. stay content on both
    engines); empty and whitespace-only anchors drop. Only absolute
    http(s) targets aggregate (the engine's own link-path prefilter,
    engine.py run_iteration) — a relative href like ``/about`` appears on
    every site, so grouping it would merge unrelated targets; resolution
    against the source page belongs to the frontier step, upstream of this
    rollup. Targets then canonicalize via the shared URL rules.
    Deterministic total order: (refs DESC, anchor ASC) per target.

    Scale shape: groupBy (dst, anchor) with map-side combine, then ONE
    dst-key exchange where the rank filter gets map-side WindowGroupLimit
    pruning — output bounded at k * |targets|. No UDFs."""
    from pyspark.sql import Window

    from ..functions.urls import canonicalize_url_col

    d = (
        links.filter(F.col(dst_col).rlike(r"^\s*[Hh][Tt][Tt][Pp][Ss]?://"))
        .select(
            canonicalize_url_col(dst_col).alias("dst"),
            F.trim(
                F.regexp_replace(
                    F.lower(F.col(anchor_col)), r"[ \t\n\x0B\f\r]+", " "
                )
            ).alias("anchor"),
        )
        .filter(F.col("anchor") != "")
    )
    counts = d.groupBy("dst", "anchor").agg(F.count(F.lit(1)).alias("refs"))
    w = Window.partitionBy("dst").orderBy(F.col("refs").desc(), F.col("anchor"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("dst", "anchor", "refs", "rank")
    )
