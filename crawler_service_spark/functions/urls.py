"""URL canonicalization + identity — the engine's scalar-function layer.

The canonicalization contract is defined ONCE and implemented twice:

- ``canonicalize_url_col`` — Spark Column expressions (JVM-side, whole-stage
  codegen; no Python in the hot path);
- ``canonicalize_url_py`` — pure Python, used by the single-threaded oracle
  crawler (tests/oracle.py) and by unit tests asserting the two agree.

Contract (applied in order):
 1. trim surrounding whitespace
 2. drop the fragment (``#...``)
 3. lowercase scheme and authority
 4. drop the default port (``:80`` for http, ``:443`` for https)
 5. empty path -> ``/``; otherwise strip trailing ``/`` runs (but keep root ``/``)

URL identity is ``xxhash64(canonical_url)`` (JVM-side ``F.xxhash64``), used for
hash-partitioning the URL-seen set and the Bloom filters. Because xxhash64 WILL
collide at 10^10 keys (birthday bound: a handful of expected collisions in 2^64),
every exact membership join conditions on the full ``url`` string as well; the
hash is a partitioning/pruning key, never the identity itself.

Reference parity: extension extraction re-expresses ``get_extension`` at
crawlers/globus_base_preserved.py:157-169 (and its 3 copies); the extension->class
mapping re-expresses the SimpleExtensionGrouper tally classes at
crawlers/globus_base_preserved.py:41-43,324-346.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------------------- #
# canonicalization — Spark column implementation
# --------------------------------------------------------------------------- #


def canonicalize_url_col(url: Column | str) -> Column:
    """Canonical URL as a Column expression (built-ins only, codegen-friendly).

    Performance note (measured, not theoretical): Spark's codegen
    subexpression elimination does NOT dedupe expressions inside ``when``
    branches, and this tree is referenced several times per candidate row
    (url / host / path / hash / scheme filter). An earlier draft built on
    ``regexp_replace``/``regexp_extract`` chains and cost ~150µs/row on the
    hot candidate path; this version keeps ONE anchored rlike for scheme
    detection plus one tiny regex on the (short) path suffix — everything
    else is instr/substr/substring_index, so the inevitable re-evaluation is
    nanoseconds, not regex engine invocations over the full URL.
    """
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    u = F.substring_index(u, "#", 1)  # drop fragment (from first '#')
    has_scheme = u.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://")
    pos = F.instr(u, "://")  # under has_scheme, the first '://' ends the scheme
    scheme = F.lower(u.substr(F.lit(1), pos - 1))
    rest = u.substr(pos + 3, F.length(u))
    slash = F.instr(rest, "/")
    auth = F.lower(F.when(slash > 0, rest.substr(F.lit(1), slash - 1)).otherwise(rest))
    auth = (
        F.when((scheme == "http") & auth.endswith(":80"), auth.substr(F.lit(1), F.length(auth) - 3))
        .when((scheme == "https") & auth.endswith(":443"), auth.substr(F.lit(1), F.length(auth) - 4))
        .otherwise(auth)
    )
    path = F.when(slash > 0, rest.substr(slash, F.length(rest))).otherwise(F.lit(""))
    path = F.regexp_replace(path, r"/+$", "")  # short string; strips trailing '/' runs
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.when(has_scheme, F.concat(scheme, F.lit("://"), auth, path)).otherwise(u)


# canonical URLs have a lowercased scheme; anchored like the python twins so a
# scheme-less string containing '://' mid-string never parses as a URL
_ANCHORED_SCHEME = r"^[a-z][a-z0-9+.\-]*://"


def host_col(canonical_url: Column | str) -> Column:
    """Host (authority minus port) of an already-canonical URL; '' when the
    input has no anchored scheme (matches host_py)."""
    u = F.col(canonical_url) if isinstance(canonical_url, str) else canonical_url
    pos = F.instr(u, "://")
    rest = u.substr(pos + 3, F.length(u))
    auth = F.substring_index(rest, "/", 1)
    return F.when(
        u.rlike(_ANCHORED_SCHEME),
        F.regexp_replace(auth, r":\d+$", ""),  # tiny regex on the short authority
    ).otherwise(F.lit(""))


def path_col(canonical_url: Column | str) -> Column:
    u = F.col(canonical_url) if isinstance(canonical_url, str) else canonical_url
    pos = F.instr(u, "://")
    rest = u.substr(pos + 3, F.length(u))
    slash = F.instr(rest, "/")
    p = F.when(
        u.rlike(_ANCHORED_SCHEME),
        F.when(slash > 0, rest.substr(slash, F.length(rest))).otherwise(F.lit("")),
    ).otherwise(u)  # scheme-less input passes through (python twin parity)
    return F.when(p == "", F.lit("/")).otherwise(p)


def url_hash_col(canonical_url: Column | str) -> Column:
    """xxhash64 identity/partitioning key (JVM-side; see module docstring)."""
    u = F.col(canonical_url) if isinstance(canonical_url, str) else canonical_url
    return F.xxhash64(u)


# --------------------------------------------------------------------------- #
# canonicalization — pure-Python twin (oracle + tests)
# --------------------------------------------------------------------------- #

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*)://")


def canonicalize_url_py(url: str) -> str:
    u = url.strip()
    u = re.sub(r"#.*$", "", u)
    m = _SCHEME_RE.match(u)
    if not m:
        return u
    scheme = m.group(1).lower()
    rest = u[m.end():]
    slash = rest.find("/")
    authority = (rest if slash < 0 else rest[:slash]).lower()
    if scheme == "http" and authority.endswith(":80"):
        authority = authority[:-3]
    elif scheme == "https" and authority.endswith(":443"):
        authority = authority[:-4]
    path = "" if slash < 0 else rest[slash:]
    path = re.sub(r"/+$", "", path)
    if path == "":
        path = "/"
    return f"{scheme}://{authority}{path}"


def host_py(canonical_url: str) -> str:
    m = re.match(r"^[a-z][a-z0-9+.\-]*://([^/]*)", canonical_url)
    auth = m.group(1) if m else ""
    return re.sub(r":\d+$", "", auth)


def path_py(canonical_url: str) -> str:
    p = re.sub(r"^[a-z][a-z0-9+.\-]*://[^/]*", "", canonical_url)
    return p if p else "/"


# --------------------------------------------------------------------------- #
# extension + class mapping (reference C1 / C11)
# --------------------------------------------------------------------------- #


def extension_col(name: Column | str) -> Column:
    """Last ``.``-suffix of the basename, lowercased; NULL when no dot.

    Re-expresses get_extension (crawlers/globus_base_preserved.py:157-169) with
    built-ins: substring_index on the basename.
    """
    n = F.col(name) if isinstance(name, str) else name
    base = F.substring_index(n, "/", -1)
    return F.when(
        base.contains("."), F.lower(F.substring_index(base, ".", -1))
    ).otherwise(F.lit(None).cast("string"))


# extension -> file-class, mirroring the reference tally classes
# {text, tabular, images, compressed, other} (crawlers/globus_base_preserved.py:43)
EXT_CLASS: dict[str, str] = {
    "txt": "text", "md": "text", "html": "text", "htm": "text", "xml": "text",
    "json": "text", "rst": "text", "tex": "text",
    "csv": "tabular", "tsv": "tabular", "parquet": "tabular", "xls": "tabular",
    "xlsx": "tabular", "hdf5": "tabular", "h5": "tabular",
    "png": "images", "jpg": "images", "jpeg": "images", "gif": "images",
    "tif": "images", "tiff": "images", "bmp": "images",
    "zip": "compressed", "tar": "compressed", "gz": "compressed",
    "tgz": "compressed", "z": "compressed", "7z": "compressed", "bz2": "compressed",
}


def ftp_dir_guess_col(name: Column | str) -> Column:
    """F4: the crawler's guess-by-extension directory heuristic — a basename
    with a '.' in one of the last four positions (1-3 char suffix) is a FILE;
    anything else is presumed a directory worth descending into. Re-expresses
    ``_is_ftp_dir(guess_by_extension=True)`` at crawlers/local_posix.py:117-131
    (the reference's cwd-probe fallback is live-connection I/O, not a
    predicate, so only the guess fast path has a DataFrame form)."""
    n = F.col(name) if isinstance(name, str) else name
    base = F.substring_index(n, "/", -1)
    is_file = (
        (F.substring(base, -4, 1) == ".")
        | (F.substring(base, -3, 1) == ".")
        | (F.substring(base, -2, 1) == ".")
    )
    return ~is_file


def ext_class_col(ext: Column | str) -> Column:
    """Map extension -> class with a literal map lookup (no UDF, no join needed:
    the mapping is tiny and constant-folds into the plan)."""
    e = F.lower(F.col(ext) if isinstance(ext, str) else ext)
    mapping = F.create_map(*[F.lit(x) for kv in EXT_CLASS.items() for x in kv])
    return F.coalesce(mapping[e], F.lit("other"))
