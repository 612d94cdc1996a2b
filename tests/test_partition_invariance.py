"""Determinism under different parallelism: the crawl's full output state is
identical regardless of partition count (SURVEY.md §7 watch-list item
"deterministic ordering under parallelism").

Core-count scaling (local[8] vs local[32]) is evidenced by bench.py — a Spark
session's master is fixed per JVM, so here we vary the other parallelism axis,
``spark.sql.shuffle.partitions``, which changes every shuffle's partitioning
(and thus task interleaving) between the two runs.
"""

from __future__ import annotations

from crawler_service_spark.engine import CrawlConfig, CrawlEngine
from tests.conftest import engine_snapshot

ITER_S = 4.0


def run_with_partitions(spark, fixture, wd, n_parts: int):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    try:
        eng = CrawlEngine(
            spark,
            pages=spark.read.parquet(fixture["pages"]),
            robots=spark.read.parquet(fixture["robots_rules"]),
            workdir=str(wd),
            config=CrawlConfig(iteration_seconds=ITER_S, max_iterations=200),
        )
        stats = eng.run(seeds=spark.read.parquet(fixture["seeds"]))
        assert stats[-1]["status"] == "complete"
        return engine_snapshot(eng)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_crawl_state_invariant_across_partitioning(
    spark, tiny_fixture, tmp_path_factory
):
    snap3 = run_with_partitions(
        spark, tiny_fixture, tmp_path_factory.mktemp("wd-p3"), 3
    )
    snap13 = run_with_partitions(
        spark, tiny_fixture, tmp_path_factory.mktemp("wd-p13"), 13
    )
    assert snap3 == snap13
    assert snap3["state"][1] == "complete"


def test_doc_pipeline_ops_invariant_across_partitioning(spark):
    """The training-data operators are pure functions of their input set:
    identical results at shuffle_partitions 2 vs 7 and input repartition
    1 vs 5 (aggregations, LSH bucketing, verification joins are all
    order-independent by construction)."""
    from pyspark.sql import functions as F

    from crawler_service_spark.operators import docdedup, similarity, textquality

    base = "the quick brown fox jumps over the lazy dog again and again tonight"
    docs_rows = [(i, f"{base} variant {i % 7} tail {i}") for i in range(60)]
    vec_rows = [
        (i, [((i * 37 + j * 11) % 2001) - 1000 for j in range(16)]) for i in range(60)
    ]

    def run(n_parts: int, n_input: int):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
        try:
            docs = spark.createDataFrame(docs_rows, "doc_id long, text string").repartition(n_input)
            vecs = spark.createDataFrame(vec_rows, "vec_id long, qv array<long>").repartition(n_input)
            return {
                "minhash": sorted(map(tuple, docdedup.minhash_verified_pairs(
                    docs, threshold_permille=300).collect())),
                "simhash": sorted(map(tuple, docdedup.simhash(docs).collect())),
                "fingerprint": sorted(map(tuple, textquality.fingerprint(docs).collect())),
                "lsh_pairs": sorted(map(tuple, similarity.lsh_neardup_pairs(
                    vecs, dim=16, dot_threshold=100_000, n_planes=16, band_bits=4).collect())),
                "ivf": [tuple(r) for r in similarity.ivf_topk(
                    vecs, [v for v in vec_rows[0][1]], k=5, n_lists=4, n_probe=2).collect()],
            }
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    a = run(2, 1)
    b = run(7, 5)
    assert a == b


def test_round5_ops_invariant_across_partitioning(spark):
    """The round-5 corpus/graph operators are pure functions of their input
    set: identical results at shuffle_partitions 2 vs 7 and input
    repartition 1 vs 5."""
    from pyspark.sql import functions as F

    from crawler_service_spark.operators import docdedup, graph, similarity, textquality

    base = "the quick brown fox and the dog ran to a barn near the old mill tonight"
    docs_rows = [(i, f"{base} variant {i % 5} tail {i % 11}", ["en", "de"][i % 2])
                 for i in range(60)]
    edge_rows = [(i, (i * 7 + 1) % 40) for i in range(60)]
    vec_rows = [(i, [((i * 13 + j * 5) % 201) - 100 for j in range(8)], i % 3)
                for i in range(45)]

    def run(n_parts: int, n_input: int):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
        try:
            docs = spark.createDataFrame(
                docs_rows, "doc_id long, text string, lang string"
            ).repartition(n_input)
            edges = spark.createDataFrame(edge_rows, "src long, dst long").repartition(n_input)
            vecs = spark.createDataFrame(
                vec_rows, "vec_id long, qv array<long>, label int"
            ).repartition(n_input)
            return {
                "hist": sorted(map(tuple, docdedup.minhash_cluster_histogram(
                    docs, threshold_permille=300).collect())),
                "buckets": sorted(map(tuple, textquality.lm_perplexity_buckets(docs).collect())),
                "pii": sorted(map(tuple, textquality.pii_scrub(docs).collect())),
                "vocab": [tuple(r) for r in textquality.vocab_topk(docs, k=10).collect()],
                "dupng": sorted(map(tuple, textquality.dup_ngram_coverage(docs, n=3).collect())),
                "winnow": sorted(map(tuple, textquality.winnow_fingerprints(docs).collect())),
                "centroids": sorted(map(tuple, similarity.label_centroids(vecs).collect())),
                "pagerank": sorted(map(tuple, graph.pagerank_millis(edges).collect())),
            }
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    a = run(2, 1)
    b = run(7, 5)
    assert a == b


def test_lloyd_and_mix_invariant_across_partitioning(spark):
    """Round-4 additions are pure functions of the input set too: the Lloyd-
    refined centroids/codebooks (integer means over a deterministic sample)
    and the composed training-mix pipeline give identical results at
    different shuffle partitioning and input layout."""
    from pyspark.sql import functions as F

    from crawler_service_spark.operators import ann_index, similarity

    vec_rows = [
        (i, [((i * 37 + j * 11) % 2001) - 1000 for j in range(16)]) for i in range(80)
    ]

    def run(n_parts: int, n_input: int):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
        try:
            vecs = spark.createDataFrame(
                vec_rows, "vec_id long, qv array<long>"
            ).repartition(n_input)
            cents = ann_index.ivf_refine(
                vecs, similarity.ivf_seed_centroids(vecs, 4), iters=2, dim=16
            )
            return {
                "centroids": sorted(
                    (int(r["cid"]), tuple(int(x) for x in r["cv"]))
                    for r in cents.collect()
                ),
                "codebook": ann_index.pq_codebook_refined(
                    vecs, n_subspaces=4, n_codes=8, refine=2
                ),
            }
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    assert run(2, 1) == run(7, 5)


def test_late_round5_ops_invariant_across_partitioning(spark):
    """The late-round-5 batch (temporal joins, apportionment, packing,
    redirect resolution, triangles, recrawl, tf-idf/NB/postings/percentiles,
    span scrub) are pure functions of their input SET: identical collected
    results at shuffle_partitions 2 vs 7 and input repartition 1 vs 5 —
    the two-parallelism-levels determinism contract of the north rule."""
    from datetime import datetime, timedelta

    from crawler_service_spark.operators import (
        graph,
        packing,
        politeness,
        recrawl,
        temporal,
        textquality,
    )

    t0 = datetime(2026, 1, 1)
    base = "the quick brown fox and the dog ran to a barn near the old mill"
    docs_rows = [
        (i, f"{base} variant {i % 4} tail token{i % 7} end {i % 3}",
         ["en", "de", "fr"][i % 3])
        for i in range(60)
    ]
    probe_rows = [(i % 9, t0 + timedelta(seconds=37 * i), i) for i in range(70)]
    state_rows = [
        (i % 9, t0 + timedelta(seconds=90 * i), i * 11 % 101) for i in range(25)
    ]
    interval_rows = [
        (i % 9, t0 + timedelta(seconds=200 * i),
         t0 + timedelta(seconds=200 * i + 150 + 40 * (i % 5)), i)
        for i in range(20)
    ]
    host_rows = [(f"h{i:03d}.example", (i * 37) % 23) for i in range(50)]
    # redirect chains incl. a loop and an over-long chain
    redirect_rows = (
        [(i, i + 1) for i in range(0, 8)]            # 8-hop chain -> 8
        + [(100, 101), (101, 102), (102, 100)]        # 3-cycle
        + [(200 + i, 201 + i) for i in range(20)]     # 20-hop chain
    )
    tri_rows = [(i % 12, (i * 5 + 1) % 12) for i in range(40) if i % 12 != (i * 5 + 1) % 12]
    obs_rows = [
        (i, i % 13, t0 + timedelta(hours=i), f"sig{(i // 13) % 3}")
        for i in range(80)
    ]

    def run(n_parts: int, n_input: int):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
        try:
            docs = spark.createDataFrame(
                docs_rows, "doc_id long, text string, lang string"
            ).repartition(n_input)
            probes = spark.createDataFrame(
                probe_rows, "k long, ts timestamp, pid long"
            ).repartition(n_input)
            states = spark.createDataFrame(
                state_rows, "k long, ts timestamp, sid long"
            ).repartition(n_input)
            intervals = spark.createDataFrame(
                interval_rows, "k long, start_ts timestamp, end_ts timestamp, ivid long"
            ).repartition(n_input)
            hosts = spark.createDataFrame(
                host_rows, "host string, score long"
            ).repartition(n_input)
            redirects = spark.createDataFrame(
                redirect_rows, "src long, dst long"
            ).repartition(n_input)
            tri = spark.createDataFrame(tri_rows, "src long, dst long").repartition(n_input)
            obs = spark.createDataFrame(
                obs_rows, "obs_id long, url_id long, ts timestamp, content_sig string"
            ).repartition(n_input)
            return {
                "asof": sorted(map(tuple, temporal.asof_join(
                    probes, states, on="k", state_cols=["sid"]).collect())),
                "range": sorted(map(tuple, temporal.range_join(
                    probes, intervals, on="k", bucket_seconds=300).collect())),
                "budget": sorted(map(tuple, politeness.budget_allocation(
                    hosts, total_budget=997).collect())),
                "pack": sorted(map(tuple, packing.pack_sequences(
                    docs, seq_len=64).collect())),
                "redirects": sorted(map(tuple, graph.resolve_redirects(
                    redirects, doubling_rounds=4).collect())),
                "triangles": sorted(map(tuple, graph.triangle_counts(tri).collect())),
                "recrawl": sorted(map(tuple, recrawl.recrawl_schedule(obs).collect())),
                "tfidf": sorted(map(tuple, textquality.tfidf_topk(docs, k=3).collect())),
                "nb": sorted(map(tuple, textquality.nb_classify(docs).collect())),
                "postings": sorted(map(tuple, textquality.build_postings(
                    docs, head_k=5).collect())),
                "pctl": sorted(map(tuple, textquality.length_percentiles(docs).collect())),
                "scrub": sorted(map(tuple, textquality.dup_span_scrub(docs, n=5).collect())),
            }
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    a = run(2, 1)
    b = run(7, 5)
    assert a == b
    # sanity: the fixtures actually exercise the interesting regimes
    red = {r[0]: r for r in b["redirects"]}
    assert red[100][3] is False or red[100][2] is not None  # loop walked to budget
    assert any(r[1] > 0 for r in b["triangles"])            # some triangle closed
    assert sum(r[4] for r in b["budget"]) == 997            # Hamilton exactness
    # (budget_allocation columns: host, score, floor_share, rem, budget)
