"""Persisted ANN index lifecycle (ann_index): integer Lloyd refinement vs a
pure-numpy reference, build-once/query-many equivalence with the convenience
query paths, incremental append against frozen centroids/codebooks, and the
plan-shape claims (partition-pruned IVF scan; no re-encode in the PQ ADC
scan)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_service_spark.operators import ann_index, similarity
from crawler_service_spark.storage.catalog import ManifestCatalog


def _trunc_div(a: int, b: int) -> int:
    """Truncating integer division (Spark div / DuckDB //)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _quantize(vecs: np.ndarray) -> list[list[int]]:
    return [[int(v) for v in np.round(row * 1000)] for row in vecs]


@pytest.fixture(scope="module")
def ann_vectors(spark):
    """330 quantized unit vectors (32-dim), ids dense 0..329."""
    rng = np.random.default_rng(11)
    base = rng.standard_normal((330, 32))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    q = _quantize(base)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(q)], "vec_id long, qv array<long>"
    ).repartition(4)
    return df, q


def _np_assign(vecs: list[list[int]], cents: list[tuple[int, list[int]]]) -> list[int]:
    """argmin_c of -2*dot(v,c)+|c|^2, ties to smaller cid — ivf_assign's rule."""
    out = []
    for v in vecs:
        best = min(
            (
                (-2 * sum(a * b for a, b in zip(v, cv)) + sum(c * c for c in cv), cid)
                for cid, cv in cents
            )
        )
        out.append(best[1])
    return out


def _np_lloyd_step(
    vecs: list[list[int]], cents: list[tuple[int, list[int]]]
) -> list[tuple[int, list[int]]]:
    """One pure-Python Lloyd step: assign-to-nearest + per-dim truncating-div
    means, empty cells keeping their previous centroid."""
    assigned = _np_assign(vecs, cents)
    out = []
    for cid, cv in cents:
        members = [vecs[i] for i, a in enumerate(assigned) if a == cid]
        if members:
            out.append(
                (cid, [
                    _trunc_div(sum(m[d] for m in members), len(members))
                    for d in range(len(cv))
                ])
            )
        else:
            out.append((cid, cv))
    return out


@pytest.mark.parametrize("iters", [1, 2])
def test_ivf_refine_matches_numpy_reference(spark, ann_vectors, iters):
    """``iters`` Lloyd steps == the pure-Python twin iterated."""
    df, q = ann_vectors
    cents = [(i, q[i]) for i in range(8)]
    for _ in range(iters):
        cents = _np_lloyd_step(q, cents)
    want = {cid: cv for cid, cv in cents}
    got = {
        int(r["cid"]): [int(x) for x in r["cv"]]
        for r in ann_index.ivf_refine(
            df, similarity.ivf_seed_centroids(df, 8), iters=iters
        ).collect()
    }
    assert got == want


def test_ivf_index_build_query_append(spark, ann_vectors, tmp_path):
    """build -> indexed query == convenience query with the same centroids;
    append assigns new vectors against FROZEN centroids; the indexed scan is
    partition-pruned on list_id and never re-assigns the corpus."""
    df, q = ann_vectors
    old = df.filter(F.col("vec_id") < 300)
    new = df.filter(F.col("vec_id") >= 300)
    cat = ManifestCatalog(str(tmp_path / "annidx"), spark)
    ann_index.build_ivf_index(cat, old, n_lists=8, refine=1)
    ann_index.ivf_append(cat, new, commit_id="delta-1")

    qvec = q[7]
    got = ann_index.ivf_topk_indexed(cat, qvec, k=10, n_probe=2)
    plan = got._sc._jvm.PythonSQLUtils.explainString(got._jdf.queryExecution(), "simple")
    assert "PartitionFilters" in plan and "list_id" in plan, "probe must prune lists"

    # expected: same centroids (frozen from the 300-vector build), full corpus
    cents = spark.createDataFrame(
        ann_index.read_ivf_centroids(cat), "cid long, cv array<long>"
    )
    want = similarity.ivf_topk(df, qvec, k=10, n_probe=2, centroids=cents)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]

    # idempotent replay: re-appending the same commit is a no-op
    assert ann_index.ivf_append(cat, new, commit_id="delta-1") is False
    assert got.count() == 10

    # REBUILD on the grown corpus must overwrite, not silently no-op: the
    # full-corpus centroids differ from the 300-vector build's
    ann_index.build_ivf_index(cat, df, n_lists=8, refine=1)
    rebuilt = spark.createDataFrame(
        ann_index.read_ivf_centroids(cat), "cid long, cv array<long>"
    )
    want2 = similarity.ivf_topk(df, qvec, k=10, n_probe=2, centroids=rebuilt)
    got2 = ann_index.ivf_topk_indexed(cat, qvec, k=10, n_probe=2)
    assert [tuple(r) for r in got2.collect()] == [tuple(r) for r in want2.collect()]


def test_ivf_append_drift_flag_and_rebuild(spark, tmp_path):
    """Skewed appends under frozen centroids trip the rebuild flag (balance
    stat surfaced at append time), a strided-seed rebuild restores the
    bound, and the indexed query stays exact vs the convenience path with
    the same centroids before AND after the rebuild."""
    rng = np.random.default_rng(7)
    dim = 32

    def unit(v):
        return v / np.linalg.norm(v)

    axes = [np.eye(dim)[i] for i in range(8)]
    d1 = unit(axes[0] + 1.2 * np.eye(dim)[8])
    d2 = unit(axes[0] + 1.2 * np.eye(dim)[9])
    base = [
        (i, [int(x) for x in np.round(unit(axes[i % 8] + 0.05 * rng.standard_normal(dim)) * 1000)])
        for i in range(616)
    ]
    # drifted appends: two tight NEW subclusters, both inside the frozen
    # A0 centroid's cell — the shape a topic-shifted nightly crawl produces
    appended = [
        (1000 + j, [int(x) for x in np.round(unit((d1 if j % 2 == 0 else d2) + 0.05 * rng.standard_normal(dim)) * 1000)])
        for j in range(300)
    ]
    df_base = spark.createDataFrame(base, "vec_id long, qv array<long>").repartition(4)
    df_app = spark.createDataFrame(appended, "vec_id long, qv array<long>").repartition(4)
    df_full = df_base.unionByName(df_app)
    cat = ManifestCatalog(str(tmp_path / "driftidx"), spark)
    thr = 2500

    ann_index.build_ivf_index(cat, df_base, n_lists=10, refine=1)
    flagged, stats0 = ann_index.ivf_rebuild_needed(cat, thr)
    assert not flagged and stats0["n_vectors"] == 616

    with pytest.warns(RuntimeWarning, match="rebuild threshold"):
        ann_index.ivf_append(
            cat, df_app, commit_id="skew-1", rebuild_threshold_millis=thr
        )
    flagged, stats1 = ann_index.ivf_rebuild_needed(cat, thr)
    assert flagged and stats1["imbalance_millis"] > thr

    def _exact_vs_convenience():
        from pyspark.sql import functions as F  # noqa: F401 (parity with file style)

        cents = spark.createDataFrame(
            ann_index.read_ivf_centroids(cat), "cid long, cv array<long>"
        )
        qvec = base[5][1]
        got = ann_index.ivf_topk_indexed(cat, qvec, k=10, n_probe=3)
        want = similarity.ivf_topk(df_full, qvec, k=10, n_probe=3, centroids=cents)
        assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]

    _exact_vs_convenience()

    # rebuild with strided seeds (covers the appended id range) restores the
    # bound; a smallest-id re-seed would sample only the pre-drift region
    ann_index.build_ivf_index(cat, df_full, n_lists=10, refine=2, seed_mod=77)
    flagged, stats2 = ann_index.ivf_rebuild_needed(cat, thr)
    assert not flagged and stats2["imbalance_millis"] < stats1["imbalance_millis"]
    _exact_vs_convenience()

    # a stride too coarse for n_lists refuses instead of silently under-seeding
    with pytest.raises(ValueError, match="seed_mod"):
        ann_index.build_ivf_index(cat, df_full, n_lists=10, seed_mod=5000)


def test_lsh_index_build_query_append(spark, ann_vectors, tmp_path):
    """build -> indexed (multi-)probe query == convenience int_lsh_topk;
    append buckets new vectors under the frozen plane contract; the scan is
    partition-pruned on bucket."""
    df, q = ann_vectors
    old = df.filter(F.col("vec_id") < 300)
    new = df.filter(F.col("vec_id") >= 300)
    cat = ManifestCatalog(str(tmp_path / "lshidx"), spark)
    ann_index.build_lsh_index(cat, old, n_planes=8)
    ann_index.lsh_append(cat, new, commit_id="delta-1")

    qvec = q[5]
    for radius in (0, 1):
        got = ann_index.lsh_topk_indexed(cat, qvec, k=10, probe_radius=radius)
        if radius == 0:
            plan = got._sc._jvm.PythonSQLUtils.explainString(
                got._jdf.queryExecution(), "simple"
            )
            assert "PartitionFilters" in plan and "bucket" in plan
        want = similarity.int_lsh_topk(
            df, qvec, k=10, n_planes=8, probe_radius=radius
        )
        assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]

    assert ann_index.lsh_append(cat, new, commit_id="delta-1") is False


def test_pq_refined_codebook_matches_numpy_reference(spark, ann_vectors):
    """One PQ Lloyd step per subspace == encode + per-dim truncating-div
    codeword means, unused codewords keeping their seed."""
    df, q = ann_vectors
    seed_cb = similarity.pq_codebook(df, n_subspaces=8, n_codes=16)
    sub = len(seed_cb[0][0])
    want = []
    for m, words in enumerate(seed_cb):
        subvecs = [v[m * sub : (m + 1) * sub] for v in q]
        codes = _np_assign(subvecs, list(enumerate(words)))
        new_words = []
        for k, w in enumerate(words):
            members = [subvecs[i] for i, c in enumerate(codes) if c == k]
            if members:
                new_words.append(
                    [
                        _trunc_div(sum(mv[d] for mv in members), len(members))
                        for d in range(sub)
                    ]
                )
            else:
                new_words.append(w)
        want.append(new_words)
    got = ann_index.pq_codebook_refined(df, n_subspaces=8, n_codes=16, refine=1)
    assert got == want


def test_pq_index_build_query_append(spark, ann_vectors, tmp_path):
    """build -> ADC query over the persisted codes table == convenience
    pq_topk with the stored codebook; the indexed plan contains NO Python
    encode stage (the compressed-domain scan never touches the corpus);
    append encodes new vectors with the frozen codebook."""
    df, q = ann_vectors
    old = df.filter(F.col("vec_id") < 300)
    new = df.filter(F.col("vec_id") >= 300)
    cat = ManifestCatalog(str(tmp_path / "pqidx"), spark)
    built_cb = ann_index.build_pq_index(cat, old, n_subspaces=8, n_codes=16, refine=1)
    assert built_cb == ann_index.read_pq_codebook(cat)
    ann_index.pq_append(cat, new, commit_id="delta-1")

    qvec = q[3]
    got = ann_index.pq_topk_indexed(cat, qvec, k=10)
    plan = got._sc._jvm.PythonSQLUtils.explainString(got._jdf.queryExecution(), "simple")
    for marker in ("ArrowEvalPython", "mapInPandas", "BatchEvalPython"):
        assert marker not in plan, f"indexed ADC scan must not re-encode ({marker})"

    want = similarity.pq_topk(df, qvec, built_cb, k=10)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]

    # REBUILD on the grown corpus must persist the NEW codebook + codes
    cb2 = ann_index.build_pq_index(cat, df, n_subspaces=8, n_codes=16, refine=1)
    assert ann_index.read_pq_codebook(cat) == cb2
    got2 = ann_index.pq_topk_indexed(cat, qvec, k=10)
    want2 = similarity.pq_topk(df, qvec, cb2, k=10)
    assert [tuple(r) for r in got2.collect()] == [tuple(r) for r in want2.collect()]


def test_pq_append_drift_flag_and_rebuild(spark, tmp_path):
    """A distribution-shifted append under the frozen codebook trips the
    quantization-error drift flag (measured against the persisted build-time
    baseline); an in-distribution append does not; the indexed query stays
    exact vs the convenience path throughout; and a rebuild's refreshed
    codebook fits the drifted region measurably better."""
    import warnings as warnmod

    rng = np.random.default_rng(13)
    dim = 32
    axes = np.eye(dim)[:8]

    def mk(n, start_id, drift=False):
        rows = []
        for j in range(n):
            v = axes[j % 8] + 0.05 * rng.standard_normal(dim)
            v = v / np.linalg.norm(v)
            if drift:
                # scaled + shifted: a region no codeword was learned on
                v = v * 3.0 + 0.8
            rows.append((start_id + j, [int(x) for x in np.round(v * 1000)]))
        return spark.createDataFrame(
            rows, "vec_id long, qv array<long>"
        ).repartition(4)

    base = mk(240, 0)
    cat = ManifestCatalog(str(tmp_path / "pqdrift"), spark)
    cb = ann_index.build_pq_index(
        cat, base, n_subspaces=8, n_codes=16, refine=1, dim=dim
    )
    baseline = ann_index.pq_baseline_error(cat)
    assert baseline is not None
    assert baseline["n_sample"] == 240 and baseline["mean_err"] > 0

    # in-distribution append: flag must stay quiet
    ind = mk(40, 1000)
    with warnmod.catch_warnings():
        warnmod.simplefilter("error", RuntimeWarning)
        ann_index.pq_append(
            cat, ind, commit_id="ok-1", rebuild_threshold_millis=2000
        )

    # drifted append: error blows past 2x the baseline -> advisory warning
    drift = mk(60, 2000, drift=True)
    with pytest.warns(RuntimeWarning, match="schedule build_pq_index"):
        ann_index.pq_append(
            cat, drift, commit_id="skew-1", rebuild_threshold_millis=2000
        )
    err_frozen = ann_index.pq_quant_error(cb, drift)["mean_err"]
    assert (1000 * err_frozen) // baseline["mean_err"] > 2000

    # flagged or not, the codes table stays exact vs the convenience path
    full = base.unionByName(ind).unionByName(drift)
    qvec = [int(x) for x in base.filter(F.col("vec_id") == 5).collect()[0]["qv"]]
    got = ann_index.pq_topk_indexed(cat, qvec, k=10)
    want = similarity.pq_topk(full, qvec, cb, k=10)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]

    # rebuild on the grown corpus: new baseline persisted, the refreshed
    # codebook fits the drifted region strictly better than the frozen one,
    # and the indexed query matches the convenience path under the new book
    cb2 = ann_index.build_pq_index(
        cat, full, n_subspaces=8, n_codes=16, refine=1, dim=dim
    )
    base2 = ann_index.pq_baseline_error(cat)
    assert base2 is not None and base2 != baseline
    assert ann_index.pq_quant_error(cb2, drift)["mean_err"] < err_frozen
    got2 = ann_index.pq_topk_indexed(cat, qvec, k=10)
    want2 = similarity.pq_topk(full, qvec, cb2, k=10)
    assert [tuple(r) for r in got2.collect()] == [tuple(r) for r in want2.collect()]


def test_lsh_append_imbalance_warn(spark, ann_vectors, tmp_path):
    """A pile of near-identical appends concentrates one LSH bucket; the
    append-time balance stat surfaces it (probes landing there scan that
    fraction of the corpus). No rebuild lever for LSH — planes are
    data-independent — so the warning is observability plus guidance."""
    df, q = ann_vectors
    cat = ManifestCatalog(str(tmp_path / "lshbal"), spark)
    ann_index.build_lsh_index(cat, df.filter(F.col("vec_id") < 300), n_planes=6)
    s0 = ann_index.lsh_bucket_balance(cat)
    assert s0["n_vectors"] == 300 and s0["n_buckets_possible"] == 64
    assert 0 < s0["imbalance_millis"] < 15_000

    clones = spark.createDataFrame(
        [(5000 + j, q[0]) for j in range(300)], "vec_id long, qv array<long>"
    ).repartition(4)
    with pytest.warns(RuntimeWarning, match="imbalance"):
        ann_index.lsh_append(
            cat, clones, commit_id="pile-1",
            imbalance_warn_millis=s0["imbalance_millis"],
        )
    s1 = ann_index.lsh_bucket_balance(cat)
    assert s1["n_vectors"] == 600
    assert s1["max_bucket"] >= 300
    assert s1["imbalance_millis"] > s0["imbalance_millis"]


def test_ivf_indexed_query_matches_python_brute_force(spark, ann_vectors, tmp_path):
    """ivf_topk_indexed == an INDEPENDENT pure-Python integer-cosine ranking
    over the probed lists' rows (exact isqrt norms, truncating division) —
    the ground-truth check tools/ann_soak.py runs at 250k, pinned here at
    suite scale so the contract can't silently drift."""
    import math

    from crawler_service_spark.operators import ann_index, similarity
    from crawler_service_spark.storage.catalog import ManifestCatalog

    df, q = ann_vectors
    cat = ManifestCatalog(str(tmp_path / "cat"), spark)
    ann_index.build_ivf_index(cat, df, n_lists=8, refine=1, dim=32)
    qvec = q[5]

    got = [
        (r["vec_id"], r["cosine_micros"])
        for r in ann_index.ivf_topk_indexed(cat, qvec, k=7, n_probe=3).collect()
    ]

    probes = similarity.nearest_centroids_py(
        qvec, ann_index.read_ivf_centroids(cat), 3
    )
    from pyspark.sql import functions as F

    rows = (
        cat.read("ivf_lists", schema=ann_index.LISTS_SCHEMA)
        .filter(F.col("list_id").isin(list(probes)))
        .select("vec_id", "qv")
        .collect()
    )
    nq = math.isqrt(sum(v * v for v in qvec))
    scored = []
    for r in rows:
        qv = [int(x) for x in r["qv"]]
        dot = sum(a * b for a, b in zip(qv, qvec))
        na = math.isqrt(sum(a * a for a in qv))
        scored.append((_trunc_div(1_000_000 * dot, max(na * nq, 1)), int(r["vec_id"])))
    scored.sort(key=lambda t: (-t[0], t[1]))
    want = [(v, c) for c, v in scored[:7]]
    assert got == want
    assert got[0][0] == 5, "the query vector itself must rank first"
