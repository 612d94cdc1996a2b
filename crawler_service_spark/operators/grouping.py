"""Family grouping + extraction-job emission (byte-stable JSON envelopes).

Re-expresses the reference's grouper/family pipeline:
- files sharing a directory form a family; each group inside carries a parser
  (MatIOGrouper/SimpleExtensionGrouper call sites,
  crawlers/globus_base_preserved.py:225,360-409; crawlers/local_posix.py:206-226);
- families are shipped as ``{"Id": seq, "MessageBody": json.dumps(family)}``
  SQS envelopes (crawlers/globus_base_preserved.py:408-409).

Here: ``groupBy(crawl_id, base_url)`` + ``collect_list(struct(...))`` with
deterministic in-array ordering (``sort_array`` over structs whose first field
is the path), parser chosen per extension class, and ``payload_json`` built by
``to_json`` over a struct whose fields are declared in sorted-key order — so
the JSON bytes are identical across runs and cluster sizes ("emits
extraction-job metadata exactly as the reference" contract).

``family_id`` is a deterministic hash (never uuid4 — reference uses uuid4 at
crawlers/globus_base_preserved.py:189-190, which would break idempotent
iteration re-runs); ``family_seq`` is the first (minimum) member ``seq`` —
unique (families partition the scheduled pages) and monotone in emission
order, with no extra enumeration pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import ext_class_col, extension_col

# extension class -> parser, mirroring the reference's grouper strategy surface
CLASS_PARSER = {
    "text": "text_parser",
    "tabular": "tabular_parser",
    "images": "image_parser",
    "compressed": "decompressor",
    "other": "generic_parser",
}


def emit_extraction_jobs(fetched: DataFrame, iteration: int) -> DataFrame:
    """Build extraction_jobs rows from this iteration's fetched pages.

    ``fetched`` needs columns (crawl_id, url, seq) plus either a precomputed
    ``size`` (bytes — lets callers drop the heavy html column before this
    shuffle) or ``html`` to derive it. Output schema follows FIXTURES.md §5.
    """
    size = (
        F.col("size").cast("long")
        if "size" in fetched.columns
        else F.length("html").cast("long")
    )
    parser_map = F.create_map(*[F.lit(x) for kv in CLASS_PARSER.items() for x in kv])
    files = fetched.select(
        "crawl_id",
        "seq",
        F.col("url").alias("path"),
        size.alias("size"),
        extension_col("url").alias("extension"),
        F.regexp_extract("url", r"^(.*)/[^/]*$", 1).alias("base_url"),
    ).withColumn("parser", parser_map[ext_class_col("extension")])

    fams = files.groupBy("crawl_id", "base_url", "parser").agg(
        F.sort_array(
            F.collect_list(F.struct("path", "size", "extension"))
        ).alias("files"),
        F.min("seq").alias("family_seq"),
        F.count("*").alias("num_files"),
        F.sum("size").alias("total_bytes"),
    )
    fams = fams.withColumn(
        "family_id",
        F.format_string(
            "fam-%016x",
            F.abs(F.xxhash64("crawl_id", "base_url", "parser", F.lit(iteration))),
        ),
    ).withColumn("iteration", F.lit(iteration))

    # payload struct fields in sorted-key order => byte-stable to_json output
    payload = F.struct(
        F.col("base_url").alias("base_url"),
        F.col("crawl_id").alias("crawl_id"),
        F.col("family_id").alias("family_id"),
        F.col("files").alias("files"),
        F.struct(
            F.col("num_files").alias("num_files"),
            F.col("parser").alias("parser"),
            F.col("total_bytes").alias("total_bytes"),
        ).alias("group"),
    )
    return fams.select(
        "crawl_id",
        "family_id",
        "family_seq",
        "iteration",
        "files",
        "parser",
        F.to_json(payload).alias("payload_json"),
    )


# --------------------------------------------------------------------------- #
# grouped-map grouper (SURVEY.md §2.9 G2 / §2.11 UD2)
# --------------------------------------------------------------------------- #


def gen_families_grouped(docs: DataFrame, group_col: str = "source") -> DataFrame:
    """Plug-in grouper as a grouped-map pandas UDF — the Spark shape of the
    reference's ``grouper.gen_families(fdict_ls)`` strategy call
    (/root/reference/crawlers/local_posix.py:206-226): one Python callable
    receives a whole group's file dicts and emits a family summary.

    Vectorized per group (Arrow batch in, one-row frame out); the member
    digest is over the *sorted* member ids so the output is deterministic
    under any partitioning. Oracle-checked against DuckDB in
    __spark_entry__ (``g2_families_grouped``).
    """
    import hashlib

    import pandas as pd

    def fam(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(int(x) for x in pdf["doc_id"])
        digest = hashlib.md5(",".join(str(i) for i in ids).encode()).hexdigest()
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n_files": [len(ids)],
                "total_chars": [int(pdf["n_chars"].sum())],
                "members_md5": [digest],
            }
        )

    return docs.select(group_col, "doc_id", "n_chars").groupBy(group_col).applyInPandas(
        fam,
        schema=f"{group_col} string, n_files long, total_chars long, members_md5 string",
    )
