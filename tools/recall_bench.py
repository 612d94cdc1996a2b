"""ANN recall curves — the published numbers behind the recall levers.

VERDICT r2 item 8: tests/test_training_ops.py quantifies multi-probe and IVF
recall as pass/fail assertions but records no curve. This tool runs the same
planted-near-dup protocol at a larger panel and prints the recall-vs-lever
tables that BASELINE.md "Measured (round 3)" publishes and the similarity.py
docstrings cite:

- multi-probe LSH (8 planes): planted-dup recall + mean candidate fraction at
  Hamming probe radius 0 / 1 / 2;
- IVF (16 lists): planted-dup recall + scanned fraction at n_probe 1/2/4/16
  (n_probe == n_lists is exact by construction, asserted), seed centroids
  AND one-Lloyd-step refined centroids (ann_index.ivf_refine);
- PQ ADC (8x16): planted-dup recall@10 of the compressed-domain scan, seed
  codebook AND one-Lloyd-step refined codebook (pq_codebook_refined).

Protocol: 1000 random unit vectors + 100 planted near-dups (cos ~0.98-0.999,
same generator as the test fixture, seed 7), 32 query vectors whose planted
dup must appear in the ANN top-k (k=10). Deterministic; no external data.

Usage: PYTHONPATH=/root/repo python tools/recall_bench.py   (one JSON line)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crawler_service_spark.operators import ann_index, similarity
from crawler_service_spark.session import get_spark

N_BASE, N_DUP, DIM, K, N_QUERIES = 1000, 100, 32, 10, 32


def panel(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((N_BASE, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dups = base[:N_DUP] + 0.03 * rng.standard_normal((N_DUP, DIM))
    dups /= np.linalg.norm(dups, axis=1, keepdims=True)
    vecs = np.vstack([base, dups])
    rows = [(i, [int(v) for v in np.round(row * 1000)]) for i, row in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, qv array<long>").repartition(8)


def main() -> None:
    spark = get_spark("recall-bench", cpus=8, shuffle_partitions=8)
    df = panel(spark).cache()
    n_total = df.count()
    qvecs = {
        int(r["vec_id"]): [int(v) for v in r["qv"]]
        for r in df.filter(F.col("vec_id") < N_QUERIES).collect()
    }
    out = {"n_vectors": n_total, "k": K, "n_queries": N_QUERIES}

    # multi-probe LSH: recall of the planted dup (vec q -> vec N_BASE+q).
    # planes are radius-invariant and the per-bucket histogram is computed
    # ONCE — candidate counts are dict lookups, not a corpus scan per query.
    planes = similarity.int_planes(DIM, 8)
    bucket_counts = {
        int(r["bucket"]): int(r["count"])
        for r in df.withColumn(
            "bucket", similarity.int_lsh_bucket_col(F.col("qv"), planes)
        ).groupBy("bucket").count().collect()
    }
    lsh = {}
    for radius in (0, 1, 2):
        hits, cand = 0, 0
        for q, qv in qvecs.items():
            res = similarity.int_lsh_topk(df, qv, k=K, n_planes=8, probe_radius=radius)
            ids = {int(r["vec_id"]) for r in res.collect()}
            probes = similarity.probe_buckets_py(qv, planes, radius)
            cand += sum(bucket_counts.get(b, 0) for b in probes)
            if N_BASE + q in ids:
                hits += 1
        lsh[f"radius_{radius}"] = {
            "recall": round(hits / N_QUERIES, 3),
            "scan_frac": round(cand / (N_QUERIES * n_total), 4),
        }
    out["multiprobe_lsh_8planes"] = lsh

    # IVF: n_probe sweep at seed AND 1-Lloyd-step refined centroids;
    # n_probe == n_lists must equal exact
    seed_cents = similarity.ivf_seed_centroids(df, 16).localCheckpoint()
    refined_cents = ann_index.ivf_refine(df, seed_cents, iters=1).localCheckpoint()
    ivf = {}
    for label, cents in (("seed", seed_cents), ("lloyd1", refined_cents)):
        for n_probe in (1, 2, 4, 16):
            hits = 0
            for q, qv in qvecs.items():
                res = similarity.ivf_topk(
                    df, qv, k=K, n_lists=16, n_probe=n_probe, centroids=cents
                )
                ids = {int(r["vec_id"]) for r in res.collect()}
                if N_BASE + q in ids:
                    hits += 1
            # scanned fraction is data-dependent per query only through the
            # probe list; approximate with the mean list mass of the probes
            ivf[f"{label}_probe_{n_probe}"] = {
                "recall": round(hits / N_QUERIES, 3),
                "scan_frac": round(n_probe / 16, 4),
            }
    # list balance: Lloyd's main effect at ceiling-recall panels — the max
    # list mass bounds the worst-case probe scan, so report max/mean
    for label, cents in (("seed", seed_cents), ("lloyd1", refined_cents)):
        sizes = [
            int(r["count"])
            for r in similarity.ivf_assign(df, centroids=cents)
            .groupBy("list_id").count().collect()
        ]
        ivf[f"{label}_balance"] = {
            "max_list": max(sizes), "mean_list": round(n_total / 16, 1),
            "max_over_mean": round(max(sizes) / (n_total / 16), 2),
        }

    exact5 = [(int(r["vec_id"]), int(r["cosine_micros"]))
              for r in similarity.int_cosine_topk(df, qvecs[5], k=K).collect()]
    for cents in (seed_cents, refined_cents):
        full5 = [(int(r["vec_id"]), int(r["cosine_micros"]))
                 for r in similarity.ivf_topk(
                     df, qvecs[5], k=K, n_lists=16, n_probe=16, centroids=cents
                 ).collect()]
        assert full5 == exact5, "IVF probe-all must be exact"
    out["ivf_16lists"] = ivf

    # PQ ADC scan: recall@K of the planted dup from compressed codes,
    # seed codebook vs one Lloyd step per subspace
    for label, cb in (
        ("seed", similarity.pq_codebook(df, n_subspaces=8, n_codes=16)),
        ("lloyd1", ann_index.pq_codebook_refined(df, n_subspaces=8, n_codes=16, refine=1)),
    ):
        hits = 0
        for q, qv in qvecs.items():
            ids = {int(r["vec_id"]) for r in similarity.pq_topk(df, qv, cb, k=K).collect()}
            if N_BASE + q in ids:
                hits += 1
        out[f"pq_adc_8x16_{label}"] = {
            "recall": round(hits / N_QUERIES, 3), "scan_frac": 1.0,
            "bytes_per_vec_vs_exact": f"8/{4 * DIM}",
        }

    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
