"""ANN index lifecycle soak: build -> drifted append -> flag -> rebuild at 250k.

The drift machinery (ivf_append balance flag, pq_append quantization-error
flag, range-spread rebuild seeding) is unit-tested at hundreds of vectors;
this drives the full lifecycle at 250k vectors / 32 dims — the at-depth run
for the round-5 index-maintenance claims, the ANN analogue of
tools/corpus_soak.py:

  1. build the IVF + PQ indexes on a 200k uniform corpus, record balance /
     error baselines and build walls;
  2. append 50k DISTRIBUTION-SHIFTED vectors (clustered in a corner of the
     space) under the frozen quantizers — the IVF balance flag and the PQ
     quantization-error flag must BOTH trip (RuntimeWarning + advisory
     stats), queries must stay exact (verified against a brute-force top-k
     over the probed lists' rows);
  3. rebuild on the grown corpus with range-spread seeding (seed_mod>1) —
     balance must drop back under the threshold and the flag clear;
  4. re-query: still brute-force-exact over the probed lists, wall
     unchanged (partition-pruned scans don't care about corpus growth).

Usage: PYTHONPATH=/root/repo python tools/ann_soak.py
Env: ANN_SOAK_BASE (200000), ANN_SOAK_APPEND (50000), SPARK_GRAFT_CPUS (32).
"""

from __future__ import annotations

import json
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crawler_service_spark.operators import ann_index, similarity
from crawler_service_spark.session import get_spark
from crawler_service_spark.storage.catalog import ManifestCatalog

N_BASE = int(os.environ.get("ANN_SOAK_BASE", "200000"))
N_APPEND = int(os.environ.get("ANN_SOAK_APPEND", "50000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DIM = 32
N_LISTS = 32
N_PROBE = 4
K = 10
THRESH = 2000  # millis: max list > 2x uniform share trips the flag
CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".cache", "ann_soak")


def _vectors(spark, start: int, n: int, drifted: bool):
    """Deterministic synthetic corpus. The base regime hashes (vec_id, dim)
    so vectors spread uniformly over the space (a linear lattice formula
    concentrates IVF assignments 7x); the drifted regime clusters in a
    corner on purpose."""
    df = spark.range(start, start + n).select(F.col("id").alias("vec_id"))
    if drifted:
        qv = F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda j: (900 + (F.col("vec_id") * 13 + j * 7) % 201).cast("long"),
        )
    else:
        qv = F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda j: (F.pmod(F.xxhash64(F.col("vec_id"), j), F.lit(2001)) - 1000).cast("long"),
        )
    return df.select("vec_id", qv.alias("qv"))


def _brute_probed_topk(spark, cat, qvec, n_probe=N_PROBE, k=K):
    """INDEPENDENT ground truth: collect the probed lists' rows and rank by
    the integer-cosine contract in pure Python (exact isqrt norms,
    truncating division) — the indexed query must match row-for-row."""
    import math

    probes = similarity.nearest_centroids_py(
        qvec, ann_index.read_ivf_centroids(cat), n_probe
    )
    rows = (
        cat.read("ivf_lists", schema=ann_index.LISTS_SCHEMA)
        .filter(F.col("list_id").isin(list(probes)))
        .select("vec_id", "qv")
        .collect()
    )

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b > 0) else -q

    nq = math.isqrt(sum(v * v for v in qvec))
    scored = []
    for r in rows:
        qv = [int(x) for x in r["qv"]]
        dot = sum(a * b for a, b in zip(qv, qvec))
        na = math.isqrt(sum(a * a for a in qv))
        scored.append((tdiv(1_000_000 * dot, max(na * nq, 1)), int(r["vec_id"])))
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [(v, c) for c, v in scored[:k]]


def main() -> None:
    spark = get_spark("ann-soak", cpus=CPUS, shuffle_partitions=CPUS)
    base_path = os.path.join(CACHE, f"base_{N_BASE}")
    drift_path = os.path.join(CACHE, f"drift_{N_APPEND}")
    if not os.path.exists(base_path):
        _vectors(spark, 0, N_BASE, False).repartition(CPUS).write.mode(
            "overwrite").parquet(base_path)
    if not os.path.exists(drift_path):
        _vectors(spark, N_BASE, N_APPEND, True).repartition(CPUS).write.mode(
            "overwrite").parquet(drift_path)
    base = spark.read.parquet(base_path)
    drift = spark.read.parquet(drift_path)
    qvec = [int(v) for v in base.filter(F.col("vec_id") == 0).collect()[0]["qv"]]
    out: dict = {"n_base": N_BASE, "n_append": N_APPEND, "dim": DIM,
                 "n_lists": N_LISTS, "cpus": CPUS}

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        cat = ManifestCatalog(td, spark)

        t0 = time.monotonic()
        ann_index.build_ivf_index(cat, base, n_lists=N_LISTS, refine=1, dim=DIM)
        out["ivf_build_s"] = round(time.monotonic() - t0, 2)
        out["balance_after_build"] = ann_index.ivf_list_balance(cat)
        assert out["balance_after_build"]["imbalance_millis"] <= THRESH, out

        t0 = time.monotonic()
        ann_index.build_pq_index(cat, base, n_subspaces=8, n_codes=16, refine=1)
        out["pq_build_s"] = round(time.monotonic() - t0, 2)

        # query against the fresh index, verified brute-force-exact
        t0 = time.monotonic()
        r1 = ann_index.ivf_topk_indexed(cat, qvec, k=K, n_probe=N_PROBE).collect()
        out["ivf_query_fresh_s"] = round(time.monotonic() - t0, 2)
        want = _brute_probed_topk(spark, cat, qvec)
        assert [(r["vec_id"], r["cosine_micros"]) for r in r1] == want, \
            "indexed query != python brute force over probed lists (fresh)"

        # drifted append: BOTH flags must trip
        with warnings.catch_warnings(record=True) as ws:
            warnings.simplefilter("always")
            t0 = time.monotonic()
            ann_index.ivf_append(cat, drift, "soak-append-1",
                                 rebuild_threshold_millis=THRESH)
            out["ivf_append_s"] = round(time.monotonic() - t0, 2)
            t0 = time.monotonic()
            ann_index.pq_append(cat, drift, "soak-append-1",
                                rebuild_threshold_millis=1500)
            out["pq_append_s"] = round(time.monotonic() - t0, 2)
        msgs = [str(w.message) for w in ws if w.category is RuntimeWarning]
        assert any("ivf_lists imbalance" in m for m in msgs), msgs
        assert any("quantization error" in m for m in msgs), msgs
        flagged, stats = ann_index.ivf_rebuild_needed(cat, THRESH)
        out["balance_after_drift"] = stats
        assert flagged, stats

        # queries stay exact against the drifted index (the index is
        # imbalanced, not wrong)
        t0 = time.monotonic()
        r2 = ann_index.ivf_topk_indexed(cat, qvec, k=K, n_probe=N_PROBE).collect()
        out["ivf_query_drifted_s"] = round(time.monotonic() - t0, 2)
        want = _brute_probed_topk(spark, cat, qvec)
        assert [(r["vec_id"], r["cosine_micros"]) for r in r2] == want, \
            "indexed query != python brute force over probed lists (drifted)"

        # rebuild on the grown corpus with range-spread seeding
        grown = base.unionByName(drift)
        t0 = time.monotonic()
        ann_index.build_ivf_index(cat, grown, n_lists=N_LISTS, refine=1,
                                  dim=DIM, seed_mod=7)
        out["ivf_rebuild_s"] = round(time.monotonic() - t0, 2)
        flagged, stats = ann_index.ivf_rebuild_needed(cat, THRESH)
        out["balance_after_rebuild"] = stats
        assert not flagged, stats
        assert stats["n_vectors"] == N_BASE + N_APPEND, stats

        t0 = time.monotonic()
        r3 = ann_index.ivf_topk_indexed(cat, qvec, k=K, n_probe=N_PROBE).collect()
        out["ivf_query_rebuilt_s"] = round(time.monotonic() - t0, 2)
        want = _brute_probed_topk(spark, cat, qvec)
        assert [(r["vec_id"], r["cosine_micros"]) for r in r3] == want, \
            "indexed query != python brute force over probed lists (rebuilt)"

        t0 = time.monotonic()
        pq = ann_index.pq_topk_indexed(cat, qvec, k=K).collect()
        out["pq_query_s"] = round(time.monotonic() - t0, 2)
        assert len(pq) == K

    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
