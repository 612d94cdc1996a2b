"""Corpus-pipeline soak: the dedup/quality operators at 50x the bench corpus.

The sf1 crawl soak (BASELINE.md round 4) evidenced the FRONTIER path at depth;
this is the same exercise for the corpus operators: inflate the sf0.1
documents table 50x (250k docs) with a CONTROLLED duplicate structure, then
run the dedup/quality pipeline and assert the structure comes back out.

Inflation contract (per base doc, REPS replicas):
  - replicas 0..NDUP-1 copy the base text VERBATIM  -> NDUP exact duplicates
  - replicas NDUP..REPS-1 append FILLER_TOKENS unique tokens (~3x doc length)
    -> Jaccard vs any sibling ~0.14-0.24, below the 300-permille gate, so
    they must NOT join the near-dup cluster

What the assertions pin:
  - exact_dedup keeper count == distinct base texts + 5000*(REPS-NDUP)
  - every verbatim-duplicate group lands in a near-dup cluster, so docs in
    clusters of size >= NDUP must cover >= 5000*NDUP rows (base-corpus
    template overlap can merge groups into bigger clusters — the bound is
    one-sided by design)
  - identical copies share every 5-gram: >= 5000*NDUP docs read
    dup_permille == 1000 in dup_ngram_coverage
  - filler replicas are mostly-unique: their dup_permille stays < 1000

Usage: PYTHONPATH=/root/repo python tools/corpus_soak.py
Env: SOAK_SF_DIR (default /root/testdata/sf0.1), SOAK_MULT (50),
     SOAK_NDUP (10), SPARK_GRAFT_CPUS (32).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crawler_service_spark.operators import docdedup, textquality
from crawler_service_spark.session import get_spark

SF_DIR = os.environ.get("SOAK_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SOAK_MULT", "50"))
NDUP = int(os.environ.get("SOAK_NDUP", "10"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
FILLER_TOKENS = 160
CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".cache", "corpus_soak")


def main() -> None:
    spark = get_spark("corpus-soak", cpus=CPUS, shuffle_partitions=CPUS)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_base = docs.count()
    n_base_texts = docs.select("text").distinct().count()

    inflated_path = os.path.join(CACHE, f"docs_x{REPS}_d{NDUP}")
    if not os.path.exists(inflated_path):
        reps = spark.range(REPS).select(F.col("id").alias("rep"))
        filler = F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(FILLER_TOKENS)),
                lambda i: F.concat_ws(
                    "", F.lit("u"), F.col("rep").cast("string"), F.lit("x"),
                    F.col("doc_id").cast("string"), F.lit("n"), i.cast("string"),
                ),
            ),
            " ",
        )
        inflated = docs.crossJoin(reps).select(
            (F.col("doc_id") * REPS + F.col("rep")).alias("doc_id"),
            F.when(F.col("rep") < NDUP, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" "), filler))
            .alias("text"),
            "lang",
            "source",
        )
        inflated.repartition(CPUS).write.mode("overwrite").parquet(inflated_path)
    big = spark.read.parquet(inflated_path)
    n_docs = big.count()
    assert n_docs == n_base * REPS, (n_docs, n_base, REPS)
    out: dict = {"base_docs": n_base, "reps": REPS, "ndup": NDUP, "docs": n_docs,
                 "cpus": CPUS, "stages": {}}

    def stage(name, fn):
        t0 = time.monotonic()
        r = fn()
        out["stages"][name] = {"wall_s": round(time.monotonic() - t0, 2), **r}
        print(f"stage {name}: {out['stages'][name]}", flush=True)
        return r

    def s_exact():
        keepers = docdedup.exact_dedup(big).count()
        want = n_base_texts + n_base * (REPS - NDUP)
        assert keepers == want, (keepers, want)
        return {"keepers": keepers, "dup_rows_removed": n_docs - keepers}

    def s_cluster_hist():
        hist = docdedup.minhash_cluster_histogram(
            big, num_hashes=16, bands=4, threshold_permille=300
        ).collect()
        total = sum(r["n_docs"] for r in hist)
        assert total == n_docs, (total, n_docs)
        in_big = sum(r["n_docs"] for r in hist if r["n_members"] >= NDUP)
        assert in_big >= n_base * NDUP, (in_big, n_base * NDUP)
        top = sorted(hist, key=lambda r: -r["n_members"])[:3]
        return {
            "docs_in_ge_ndup_clusters": in_big,
            "largest_clusters": [(r["n_members"], r["n_clusters"]) for r in top],
        }

    def s_dup_ngrams():
        cov = textquality.dup_ngram_coverage(big, n=5)
        full = cov.filter(F.col("dup_permille") == 1000).count()
        assert full >= n_base * NDUP, (full, n_base * NDUP)
        return {"rows": cov.count(), "fully_duplicated_docs": full}

    def s_lm():
        return {"rows": textquality.lm_bigram_score(big).count()}

    def s_quality():
        g = textquality.gopher_quality(big)
        return {"rows": g.count()}

    stage("exact_dedup", s_exact)
    stage("minhash_cluster_histogram", s_cluster_hist)
    stage("dup_ngram_coverage", s_dup_ngrams)
    stage("lm_bigram_score", s_lm)
    stage("gopher_quality", s_quality)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
