"""Training-data pipeline operators: LSH embedding dedup at the production
regime (planted near-dups, high threshold, narrow buckets), minhash+Jaccard
verification precision, integer-cosine contract internals, and the vectorized
byte-feature extractor vs a straightforward per-row reference."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_service_spark.operators import docdedup, multimodal, similarity


def _quantize(vecs: np.ndarray) -> list[list[int]]:
    return [[int(v) for v in np.round(row * 1000)] for row in vecs]


@pytest.fixture(scope="module")
def planted_embeddings(spark):
    """300 random unit vectors + 30 planted near-dups (cosine ~0.98-0.999)."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((300, 32))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dups = base[:30] + 0.03 * rng.standard_normal((30, 32))
    dups /= np.linalg.norm(dups, axis=1, keepdims=True)
    vecs = np.vstack([base, dups])
    rows = [(i, q) for i, q in enumerate(_quantize(vecs))]
    df = spark.createDataFrame(rows, "vec_id long, qv array<long>").repartition(4)
    return df, vecs


def _exact_pairs(df, threshold):
    a = df.select(F.col("vec_id").alias("id_a"), F.col("qv").alias("qa"))
    b = df.select(F.col("vec_id").alias("id_b"), F.col("qv").alias("qb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", similarity.int_dot_col(F.col("qa"), F.col("qb")).alias("dot"))
        .filter(F.col("dot") >= threshold)
    )


def test_lsh_neardup_pairs_production_regime(spark, planted_embeddings):
    """8-bit bands at a real near-dup threshold (cos ~0.95): precision 1.0 by
    construction, recall >= 0.9 against the exact crossJoin, and the plan must
    be equi-joins only."""
    df, _ = planted_embeddings
    threshold = 950_000
    exact = {(r["id_a"], r["id_b"]) for r in _exact_pairs(df, threshold).collect()}
    assert len(exact) >= 20, "fixture should plant enough near-dup pairs"
    # 4 bands x 8 bits: recall = 1-(1-p^8)^4 with p = 1 - theta/pi ~ 0.95
    # for the planted cos-0.98 dups -> ~0.98 expected
    got = similarity.lsh_neardup_pairs(
        df, dim=32, dot_threshold=threshold, n_planes=32, band_bits=8
    )
    plan = got._sc._jvm.PythonSQLUtils.explainString(got._jdf.queryExecution(), "simple")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    assert pairs <= exact, "exact-dot verification must give precision 1.0"
    recall = len(pairs) / len(exact)
    assert recall >= 0.9, f"recall {recall:.2f} below 0.9 at 4x8-bit bands"


def test_int_cosine_topk_matches_numpy(spark, planted_embeddings):
    df, vecs = planted_embeddings
    qrow = df.filter(F.col("vec_id") == 5).collect()[0]["qv"]
    got = similarity.int_cosine_topk(df, [int(v) for v in qrow], k=10).collect()
    q = np.array(qrow, dtype=np.float64)
    all_q = np.array([r["qv"] for r in df.orderBy("vec_id").collect()], dtype=np.float64)
    cos = (all_q @ q) / (np.linalg.norm(all_q, axis=1) * np.linalg.norm(q))
    top = np.argsort(-cos)[:10]
    assert [r["vec_id"] for r in got] == sorted(top, key=lambda i: (-cos[i], i))
    # integer cosine_micros is within quantization error of the float cosine
    for r in got:
        assert abs(r["cosine_micros"] / 1e6 - cos[r["vec_id"]]) < 5e-3


def test_isqrt_and_trunc_div_contract(spark):
    vals = [0, 1, 2, 3, 4, 15, 16, 17, 999, 10**6, 10**12, (1 << 52) - 1]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = df.select("x", similarity.isqrt_col(F.col("x")).alias("s")).collect()
    for r in got:
        assert r["s"] == math.isqrt(r["x"]), r
    dd = spark.createDataFrame([(7, 2), (-7, 2), (450000, 7), (-450000, 7)], "a long, b long")
    out = {(r["a"]): r["d"] for r in dd.select("a", similarity.trunc_div_col(F.col("a") * 1, F.col("b")).alias("d")).collect()}
    assert out[7] == 3 and out[-7] == -3  # truncation, matching DuckDB //
    assert out[450000] == 64285 and out[-450000] == -64285


def test_minhash_verified_precision(spark):
    """Verified pairs == true-Jaccard pairs restricted to the candidate set:
    every survivor must meet the threshold exactly (no false positives), and
    near-identical planted docs must survive."""
    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    docs = []
    for i in range(40):
        docs.append((i, f"unique document number {i} " + " ".join(f"tok{i}_{j}" for j in range(20))))
    docs.append((100, base))
    docs.append((101, base + " extra"))      # near-dup of 100
    docs.append((102, base.replace("quick", "slow")))  # near-dup of 100
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(4)
    got = docdedup.minhash_verified_pairs(df, threshold_permille=300).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in got}
    assert (100, 101) in pairs
    for r in got:
        assert r["jaccard_permille"] >= 300
    # verification must never pass a pair the exact Jaccard query rejects
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in docdedup.ngram_jaccard_pairs(df, threshold_permille=300).collect()
    }
    assert pairs <= exact


def test_byte_features_vectorized_matches_reference(spark):
    payloads = [b"", b"\x00", b"\xff" * 10, bytes(range(256)) * 3, b"hello world \xf0\x9f\x98\x80"]
    rows = [(i, "image", p, {}) for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA).repartition(2)
    got = {r["media_id"]: r for r in multimodal.extract_byte_features(df).collect()}
    for i, p in enumerate(payloads):
        arr = np.frombuffer(p, dtype=np.uint8)
        n = len(arr)
        r = got[i]
        assert r["n_bytes"] == n
        assert r["byte_mean_millis"] == (1000 * int(arr.sum())) // max(n, 1)
        hist = np.bincount(arr >> 4, minlength=16) if n else np.zeros(16, int)
        for k in range(16):
            assert r[f"hist_{k}"] == hist[k]
        if n:
            prob = hist[hist > 0] / n
            ent = float(-(prob * np.log2(prob)).sum())
            assert abs(r["byte_entropy_millis"] - round(ent * 1000)) <= 1
        else:
            assert r["byte_entropy_millis"] == 0


def test_multiprobe_lsh_recall_monotone(spark, planted_embeddings):
    """Multi-probe widens the candidate set monotonically, and what LSH
    actually promises — recovering TRUE near neighbors (cos ~0.99 planted
    dups), not weakly-similar top-k tail entries — must hold by radius 2
    across a panel of queries."""
    df, _ = planted_embeddings
    hits = {0: 0, 1: 0, 2: 0}
    n_queries = 8
    for q in range(n_queries):  # vec q's planted dup is vec 300+q
        qvec = [int(v) for v in df.filter(F.col("vec_id") == q).collect()[0]["qv"]]
        sizes = []
        for radius in (0, 1, 2):
            ids = {
                r["vec_id"]
                for r in similarity.int_lsh_topk(
                    df, qvec, k=50, n_planes=8, probe_radius=radius
                ).collect()
            }
            sizes.append(len(ids))
            if 300 + q in ids:
                hits[radius] += 1
        assert sizes == sorted(sizes), "candidate set must grow with radius"
    assert hits[0] <= hits[1] <= hits[2]
    assert hits[2] >= 0.9 * n_queries, f"radius-2 near-dup recall {hits[2]}/{n_queries}"


def test_ivf_topk_recall_and_exact_degradation(spark, planted_embeddings):
    """IVF: probing every list must equal exact top-k; fewer probes trade
    recall for scan volume but keep recovering planted near-dups."""
    df, _ = planted_embeddings
    qvec = [int(v) for v in df.filter(F.col("vec_id") == 5).collect()[0]["qv"]]
    exact = [(r["vec_id"], r["cosine_micros"])
             for r in similarity.int_cosine_topk(df, qvec, k=10).collect()]
    full = [(r["vec_id"], r["cosine_micros"])
            for r in similarity.ivf_topk(df, qvec, k=10, n_lists=8, n_probe=8).collect()]
    assert full == exact, "n_probe == n_lists must be exact"
    hits = 0
    for q in range(6):
        qv = [int(v) for v in df.filter(F.col("vec_id") == q).collect()[0]["qv"]]
        got = {r["vec_id"] for r in similarity.ivf_topk(df, qv, k=10, n_lists=8, n_probe=2).collect()}
        if 300 + q in got:
            hits += 1
    assert hits >= 5, f"2/8-probe IVF missed too many planted dups ({hits}/6)"


def test_sample_frames_and_resize_contracts(spark):
    """Frame windows are byte-derived and deterministic; the stand-in resizer
    subsamples by the integer round-half-up stride."""
    payload = bytes(range(256)) * 2 + b"XY"   # 514 bytes -> 3 frames
    rows = [(1, "video", payload, {})]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    frames = {r["frame_idx"]: r for r in multimodal.sample_frames(df, 256).collect()}
    assert sorted(frames) == [0, 1, 2]
    assert frames[1]["offset"] == 256
    assert frames[0]["frame_hash"] == int.from_bytes(payload[:8], "little", signed=True)
    assert frames[2]["frame_hash"] == int.from_bytes(
        payload[512:].ljust(8, b"\x00"), "little", signed=True
    )

    out = multimodal.resize_media(df, 64, 64, fake_decode=True).collect()[0]
    w = 16 + (payload[0] % 64) * 16
    h = 16 + (payload[-1] % 64) * 16
    stride = max(1, (w * h + 2048) // 4096)
    assert out["width"] == 64 and out["height"] == 64
    assert bytes(out["payload"]) == payload[::stride]
    assert out["n_bytes"] == len(payload[::stride])

    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        multimodal.resize_media(df, 64, 64)  # codec path is an honest stub


def test_gopher_quality_and_repetition_on_crafted_docs(spark):
    good = "the quick brown foxes jumped over those lazy hounds today " * 10
    short = "tiny text"
    spam = "buy " * 80  # maximally repetitive single token
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, spam)], "doc_id long, text string"
    )
    from crawler_service_spark.operators.textquality import gopher_quality, repetition_metrics

    q = {r["doc_id"]: r for r in gopher_quality(df).collect()}
    assert q[1]["gopher_pass"] is True
    assert q[2]["gopher_pass"] is False  # word count below 50
    assert q[1]["alpha_word_permille"] == 1000
    assert q[1]["word_count"] == 100

    rep = {r["doc_id"]: r for r in repetition_metrics(df).collect()}
    assert rep[3]["top_unigram_permille"] == 1000  # all one token
    assert rep[3]["top_bigram_permille"] == 1000
    assert rep[1]["top_unigram_permille"] <= 100  # each token is 1/10 of text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(3)


def test_chunk_dedup_crafted(spark):
    """Global first-occurrence semantics: whole-doc dup keeps nothing, partial
    overlap keeps only novel chunks, within-doc repeats dedup too."""
    import hashlib

    d = _docs(
        spark,
        [
            (1, "a b c d e f"),
            (2, "a b c d e f"),          # exact dup of doc 1 -> keeps nothing
            (3, "a b c x y z"),          # first chunk dup, second novel
            (4, "p q r p q r"),          # within-doc repeated chunk
        ],
    )
    out = {
        r["doc_id"]: r
        for r in docdedup.chunk_dedup(d, chunk_tokens=3).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert (out[1]["n_chunks"], out[1]["n_kept"]) == (2, 2)
    assert out[1]["kept_text_md5"] == md5("a b c d e f")
    assert (out[2]["n_chunks"], out[2]["n_kept"]) == (2, 0)
    assert out[2]["kept_text_md5"] == md5("")
    assert (out[3]["n_kept"], out[3]["kept_permille"]) == (1, 500)
    assert out[3]["kept_text_md5"] == md5("x y z")
    assert (out[4]["n_chunks"], out[4]["n_kept"]) == (2, 1)
    assert out[4]["kept_text_md5"] == md5("p q r")


def test_minhash_cluster_matches_union_find(spark):
    """Cluster rollup == Python union-find over the operator's own verified
    pairs, and the cluster id is the minimum member (the canonical keeper)."""
    base = "the quick brown fox jumps over the lazy dog near the old stone bridge at dawn every single day"
    rows = [
        (1, base),
        (2, base),                                  # exact dup of 1
        (3, base.replace("dawn", "dusk")),          # near-dup of 1/2
        (4, "completely different text about spark shuffles and partition skew in big batch jobs"),
        (5, "completely different text about spark shuffles and partition skew in big batch work"),
        (6, "a unique short document with nothing in common with the others at all whatsoever today"),
    ]
    d = _docs(spark, rows)
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in docdedup.minhash_verified_pairs(d, threshold_permille=300).collect()
    ]
    assert pairs, "fixture must produce verified near-dup pairs"
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    for node in parent:
        expected.setdefault(find(node), set()).add(node)
    expected = {k: v for k, v in expected.items() if len(v) > 1}

    got = docdedup.minhash_dup_clusters(d, threshold_permille=300).collect()
    assert {r["cluster_id"]: r["n_members"] for r in got} == {
        k: len(v) for k, v in expected.items()
    }
    for r in got:
        assert r["cluster_id"] == min(expected[r["cluster_id"]])


def test_label_centroids_integer_exact_on_negatives(spark):
    """Long-format per-label centroid: sums and truncate-toward-zero means
    (negative sums must truncate toward zero, not floor)."""
    rows = [
        (1, [10, -7]),
        (1, [20, -8]),   # label 1: sum (30, -15), mean (15, -7)  [-15 div 2 = -7]
        (2, [-3, 5]),    # label 2: sums/means equal the vector itself
    ]
    df = spark.createDataFrame(rows, "label int, qv array<long>")
    got = {
        (r["label"], r["pos"]): (r["n_vecs"], r["sum_q"], r["mean_q"])
        for r in similarity.label_centroids(df).collect()
    }
    assert got == {
        (1, 0): (2, 30, 15),
        (1, 1): (2, -15, -7),
        (2, 0): (1, -3, -3),
        (2, 1): (1, 5, 5),
    }


def test_cluster_histogram_partitions_the_corpus(spark):
    """The size distribution must (a) agree with the cluster rollup it is
    derived from, (b) include a size-1 row so sum(n_docs) == |corpus|, and
    (c) keep n_docs == n_members * n_clusters row-wise."""
    base = "the quick brown fox jumps over the lazy dog near the river bank at dawn every single day"
    d = _docs(
        spark,
        [
            (1, base),
            (2, base),                                  # cluster {1,2,3}
            (3, base.replace("dawn", "dusk")),
            (4, "completely different text about spark shuffles and partition skew in big batch jobs"),
            (5, "completely different text about spark shuffles and partition skew in big batch work"),
            (6, "a unique short document with nothing in common with the others at all whatsoever today"),
            (7, "another singleton document covering parquet row group sizing and column pruning entirely"),
        ],
    )
    clusters = docdedup.minhash_dup_clusters(d, threshold_permille=300).collect()
    expected = {}
    for r in clusters:
        expected[r["n_members"]] = expected.get(r["n_members"], 0) + 1
    covered = sum(r["n_members"] for r in clusters)
    expected[1] = 7 - covered

    hist = docdedup.minhash_cluster_histogram(d, threshold_permille=300).collect()
    assert {r["n_members"]: r["n_clusters"] for r in hist} == expected
    assert all(r["n_docs"] == r["n_members"] * r["n_clusters"] for r in hist)
    assert sum(r["n_docs"] for r in hist) == 7
    assert {r["n_members"] for r in hist} >= {1}, "size-1 row always present"


def test_minhash_dup_ids_drops_exactly_the_non_keepers(spark):
    """The drop list == every clustered doc except each cluster's min-id
    keeper (cross-checked against the cluster rollup), and unclustered docs
    never appear."""
    base = "the quick brown fox jumps over the lazy dog near the river bank at dawn every single day"
    d = _docs(
        spark,
        [
            (1, base),
            (2, base),
            (3, base.replace("dawn", "dusk")),
            (4, "completely different text about spark shuffles and partition skew in big batch jobs"),
            (5, "completely different text about spark shuffles and partition skew in big batch work"),
            (6, "a unique short document with nothing in common with the others at all whatsoever today"),
        ],
    )
    clusters = docdedup.minhash_dup_clusters(d, threshold_permille=300).collect()
    n_clustered = sum(r["n_members"] for r in clusters)
    keepers = {r["cluster_id"] for r in clusters}

    drops = {r["doc_id"] for r in docdedup.minhash_dup_ids(d, threshold_permille=300).collect()}
    assert len(drops) == n_clustered - len(keepers)
    assert not (drops & keepers), "keepers must never be dropped"
    assert 6 not in drops, "unclustered docs never appear"


def test_incremental_dups_flags_only_index_matches(spark):
    """Batch docs are flagged iff they near-duplicate an INDEX doc; a batch
    doc that only duplicates another batch doc is NOT flagged (the standing
    corpus is the sole comparison target)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma"
    index = _docs(spark, [(1, base), (2, "totally unrelated filler text about warc files and parquet row groups here")])
    batch = _docs(
        spark,
        [
            (10, base),                                   # dup of index doc 1
            (15, "novel content fresh crawl page with brand new words never seen in the corpus before now"),
            (20, "novel content fresh crawl page with brand new words never seen in the corpus before now"),
            # 15/20 duplicate EACH OTHER but no index doc -> neither flagged
        ],
    )
    got = docdedup.minhash_incremental_dups(batch, index, threshold_permille=300).collect()
    assert {(r["doc_id"], r["dup_of"], r["jaccard_permille"]) for r in got} == {
        (10, 1, 1000)
    }


def test_pq_codebook_vectors_reconstruct_exactly(spark, planted_embeddings):
    """A vector that IS a codeword encodes to itself in every subspace (zero
    distortion), so its ADC score equals its exact dot with the query — the
    invariant that pins encode + LUT scoring end-to-end. Planted near-dups of
    codebook rows must also land in the ADC top-k neighborhood."""
    df, vecs = planted_embeddings
    cb = similarity.pq_codebook(df, n_subspaces=8, n_codes=16)
    qvec = [int(v) for v in np.round(vecs[0] * 1000)]

    codes = {
        r["vec_id"]: [r[f"code_{m}"] for m in range(8)]
        for r in df.filter(F.col("vec_id") < 16)
        .select("vec_id", *similarity.pq_encode_cols(cb))
        .collect()
    }
    for vid, cs in codes.items():
        assert cs == [vid] * 8, f"codeword {vid} must self-encode, got {cs}"

    # the Arrow-batch encoder must agree with the JVM expression encoder on
    # every vector (same int64 scores, same first-min tie rule)
    fast = {
        r["vec_id"]: list(r["codes"])
        for r in df.select(
            "vec_id", similarity.pq_encode_udf(cb)(F.col("qv")).alias("codes")
        ).collect()
    }
    slow = {
        r["vec_id"]: [r[f"code_{m}"] for m in range(8)]
        for r in df.select("vec_id", *similarity.pq_encode_cols(cb)).collect()
    }
    assert fast == slow, "pandas and JVM PQ encoders must be bit-identical"

    top = similarity.pq_topk(df, qvec, cb, k=10).collect()
    rows = {r["vec_id"]: r["approx_dot"] for r in top}
    exact_self = sum(a * b for a, b in zip(qvec, qvec))
    assert rows.get(0) == exact_self  # vec 0 is a codeword: ADC == exact dot
    # vec 300 is the planted near-dup of vec 0; with per-subspace cells this
    # coarse it should share most codes and surface in the top-k
    assert 300 in rows


def test_dup_span_scrub_crafted(spark):
    """ExactSubstr-style span removal on a crafted corpus: a shared 6-token
    passage (two overlapping dup 5-grams) is scrubbed end-to-end from both
    docs, unique text survives, short docs pass through whole, and a
    fully-boilerplate doc scrubs to md5('')."""
    import hashlib

    from crawler_service_spark.operators.textquality import dup_span_scrub

    shared = "alpha beta gamma delta epsilon zeta"          # 6 tokens
    docs = [
        (0, f"one two three {shared} four five six"),        # 12 tokens
        (1, f"{shared} seven eight nine ten"),               # 10 tokens
        (2, "lonely short doc"),                             # < n, kept whole
        (3, shared),                                         # fully boilerplate
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dup_span_scrub(df, n=5).collect()}

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert (got[0]["n_tokens"], got[0]["n_kept"]) == (12, 6)
    assert got[0]["scrubbed_md5"] == md5("one two three four five six")
    assert (got[1]["n_tokens"], got[1]["n_kept"]) == (10, 4)
    assert got[1]["scrubbed_md5"] == md5("seven eight nine ten")
    assert (got[2]["n_tokens"], got[2]["n_kept"]) == (3, 3)
    assert got[2]["scrubbed_md5"] == md5("lonely short doc")
    assert (got[3]["n_tokens"], got[3]["n_kept"]) == (6, 0)
    assert got[3]["kept_permille"] == 0
    assert got[3]["scrubbed_md5"] == md5("")
    # repartitioning must not change a single byte
    again = {r["doc_id"]: r for r in dup_span_scrub(df.repartition(7), n=5).collect()}
    assert {k: tuple(v) for k, v in got.items()} == {k: tuple(v) for k, v in again.items()}


def test_dup_span_scrub_consistent_with_coverage_census(spark):
    """A doc's scrubbed token count can never exceed what the coverage
    census says is unique; a doc with zero duplicated n-grams keeps all."""
    from crawler_service_spark.operators.textquality import (
        dup_ngram_coverage,
        dup_span_scrub,
    )

    rows = [
        (i, " ".join(f"w{(i * 17 + j) % 29}" for j in range(20)))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cov = {r["doc_id"]: r for r in dup_ngram_coverage(df, n=5).collect()}
    scrub = {r["doc_id"]: r for r in dup_span_scrub(df, n=5).collect()}
    for d, s in scrub.items():
        if d in cov and cov[d]["n_dup_ngrams"] == 0:
            assert s["n_kept"] == s["n_tokens"]
        if d in cov and cov[d]["n_dup_ngrams"] > 0:
            assert s["n_kept"] < s["n_tokens"]


def test_nb_classify_matches_integer_python_twin(spark):
    """Integer NB-style scorer: predictions and scores equal a literal
    Python implementation of the micros formula on a corpus with real
    class signal; argmax ties break to the smaller label."""
    from crawler_service_spark.operators.textquality import NB_SCALE, nb_classify

    docs = [
        (0, "en", "apple banana apple cherry"),
        (1, "en", "banana banana cherry apple"),
        (2, "de", "auto tur fenster auto"),
        (3, "de", "fenster auto tur tur"),
        (4, "en", "apple auto banana tur"),     # mixed evidence
        (5, "de", "cherry fenster"),            # cross-label tokens
    ]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")

    # python twin of the exact integer contract
    toks = {d: t.split() for d, _, t in docs}
    labels = sorted({l for _, l, _ in docs})
    c_tl: dict = {}
    c_l: dict = {l: 0 for l in labels}
    docs_l = {l: 0 for l in labels}
    for d, l, _ in docs:
        docs_l[l] += 1
        for t in toks[d]:
            c_tl[(t, l)] = c_tl.get((t, l), 0) + 1
            c_l[l] += 1
    vocab = len({t for t, _ in c_tl})
    expect = {}
    for d, _, _ in docs:
        scores = {}
        for l in labels:
            denom = c_l[l] + vocab
            s = (NB_SCALE * docs_l[l]) // len(docs)
            for t in toks[d]:
                s += (NB_SCALE * (c_tl.get((t, l), 0) + 1)) // denom
            scores[l] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        margin = ranked[0][1] - (ranked[1][1] if len(ranked) > 1 else ranked[0][1])
        expect[d] = (ranked[0][0], ranked[0][1], margin)

    for probe in (df, df.repartition(5)):
        got = {
            r["doc_id"]: (r["pred_label"], r["score_micros"], r["margin_micros"])
            for r in nb_classify(probe, label_col="lang").collect()
        }
        assert got == expect
    # the crafted signal must actually be recovered
    assert got[0][0] == "en" and got[2][0] == "de" and got[3][0] == "de"
    assert all(got[d][2] >= 0 for d in got)


def test_tfidf_topk_matches_integer_python_twin(spark):
    """tf·idf top-k: exact match with a literal Python implementation of
    the integer contract (Robertson rational idf in millis, truncating
    div), tie-break (tfidf DESC, tf DESC, term ASC), k cap honored."""
    from crawler_service_spark.operators.textquality import tfidf_topk

    docs = [
        (0, "apple banana apple cherry apple"),
        (1, "banana cherry cherry date"),
        (2, "date date date unique"),
        (3, "apple banana cherry date"),  # all-common doc: ties everywhere
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    K = 2

    toks = {d: t.split() for d, t in docs}
    n_docs = len(docs)
    tf: dict = {}
    for d, _ in docs:
        for t in toks[d]:
            tf[(d, t)] = tf.get((d, t), 0) + 1
    dfreq: dict = {}
    for (_, t), _c in tf.items():
        dfreq[t] = dfreq.get(t, 0) + 1
    expect = set()
    for d, _ in docs:
        rows = []
        for t in set(toks[d]):
            idf = (1000 * (n_docs - dfreq[t] + 1)) // (dfreq[t] + 1)
            rows.append((t, tf[(d, t)], tf[(d, t)] * idf))
        rows.sort(key=lambda r: (-r[2], -r[1], r[0]))
        for rank, (t, c, s) in enumerate(rows[:K], 1):
            expect.add((d, rank, t, c, s))

    for probe in (df, df.repartition(3)):
        got = {
            (r["doc_id"], r["term_rank"], r["term"], r["tf"], r["tfidf_millis"])
            for r in tfidf_topk(probe, k=K).collect()
        }
        assert got == expect
    # rare terms must outrank ubiquitous ones: doc 2's 'unique' (df=1)
    assert (2, 2, "unique", 1, (1000 * 4) // 2) in expect or any(
        e[0] == 2 and e[2] == "unique" for e in expect
    )


def test_build_postings_matches_python_twin(spark):
    """Inverted-index build: df/cf/head/d-gap-md5 equal a literal Python
    twin; postings order is ascending doc_id regardless of partitioning;
    head cap honored."""
    import hashlib

    from crawler_service_spark.operators.textquality import build_postings

    docs = [
        (10, "alpha beta alpha"),
        (3, "beta gamma"),
        (7, "alpha alpha gamma gamma gamma"),
        (1, "delta"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    K = 2

    post: dict = {}
    for d, t in docs:
        counts: dict = {}
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
        for w, c in counts.items():
            post.setdefault(w, []).append((d, c))
    expect = {}
    for w, lst in post.items():
        lst.sort()
        ds = [d for d, _ in lst]
        enc = ",".join(
            f"{d - (ds[i-1] if i else 0)}:{c}" for i, (d, c) in enumerate(lst)
        )
        expect[w] = (
            len(lst),
            sum(c for _, c in lst),
            tuple(ds[:K]),
            hashlib.md5(enc.encode()).hexdigest(),
        )

    for probe in (df, df.repartition(3)):
        got = {
            r["term"]: (r["df"], r["cf"], tuple(r["head_docs"]), r["postings_md5"])
            for r in build_postings(probe, head_k=K).collect()
        }
        assert got == expect
    # multi-doc term really is d-gap encoded (alpha in docs 3?no: 7,10)
    assert expect["alpha"][2] == (7, 10)


def test_length_percentiles_match_python_twin(spark):
    """Order-statistic percentiles: min length whose cumulative count
    reaches ceil(k*n/100) — exact vs a literal Python twin, invariant to
    partitioning, ties and single-doc languages handled."""
    from crawler_service_spark.operators.textquality import length_percentiles

    docs = [(i, "en", "w " * (i + 1)) for i in range(10)]          # 1..10 tokens
    docs += [(100 + i, "de", "x " * 5) for i in range(4)]          # all ties: 5
    docs += [(200, "fr", "solo tokens here")]                      # single doc
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")

    def twin():
        by_lang: dict = {}
        for _, lang, text in docs:
            by_lang.setdefault(lang, []).append(len(text.split()))
        out = {}
        for lang, ls in by_lang.items():
            ls.sort()
            n = len(ls)
            def pick(k):
                need = (k * n + 99) // 100
                cum = 0
                for v in ls:
                    cum += 1
                    if cum >= need:
                        return v
            out[lang] = (n, ls[0], pick(50), pick(90), pick(99), ls[-1])
        return out

    expect = twin()
    for probe in (df, df.repartition(5)):
        got = {
            r["lang"]: (
                r["n_docs"], r["min_tokens"], r["p50"], r["p90"], r["p99"],
                r["max_tokens"],
            )
            for r in length_percentiles(probe).collect()
        }
        assert got == expect
    assert expect["de"] == (4, 5, 5, 5, 5, 5)       # tie collapse
    assert expect["fr"][2:5] == (3, 3, 3)           # single doc: all = len
    assert expect["en"][2] == 5 and expect["en"][4] == 10
