"""Decontamination and integer-BM25 keyword search semantics."""

from __future__ import annotations

from crawler_service_spark.operators import docdedup, textquality


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_eval_overlap(spark):
    bench = _docs(spark, [(1000, "the capital of france is paris obviously")])
    docs = _docs(spark, [
        # contains the full eval sentence -> many shared trigrams
        (1, "quiz answer: the capital of france is paris obviously says the book"),
        # shares exactly two trigrams ("capital of france", "of france is") < min_overlap=3
        (2, "a capital of france is what they asked"),
        # disjoint
        (3, "completely unrelated text about spark shuffles and joins here"),
        # too short to shingle
        (4, "tiny doc"),
    ])
    out = {r["doc_id"]: r for r in docdedup.decontaminate(docs, bench, min_overlap=3).collect()}
    assert set(out) == {1, 2, 3, 4}, "every corpus doc gets a row"
    assert out[1]["contaminated"] and out[1]["overlap_ngrams"] >= 3
    assert not out[2]["contaminated"] and out[2]["overlap_ngrams"] == 2
    assert out[3]["overlap_ngrams"] == 0 and not out[3]["contaminated"]
    assert out[4]["overlap_ngrams"] == 0


def test_keyword_topk_ranking_and_exclusion(spark):
    docs = _docs(spark, [
        (1, "spark spark spark engine"),        # high tf, short
        (2, "spark engine for big data"),       # one hit
        (3, "no relevant words at all here"),   # zero hits -> excluded
        (4, "spark " + "filler " * 200),        # one hit, long doc -> length-penalized
    ])
    out = textquality.keyword_topk(docs, ["spark"], k=10).collect()
    ids = [r["doc_id"] for r in out]
    assert 3 not in ids, "zero-hit docs must not appear"
    scores = {r["doc_id"]: r["score_micros"] for r in out}
    assert scores[1] > scores[2], "higher tf must outrank"
    assert scores[2] > scores[4], "length normalization must penalize the long doc"
    assert all(s > 0 for s in scores.values())


def test_keyword_topk_k_limit_and_determinism(spark):
    rows = [(i, "window " * (1 + i % 3) + "pad " * (i % 7)) for i in range(40)]
    docs = _docs(spark, rows)
    a = textquality.keyword_topk(docs.repartition(2), ["window"], k=5).collect()
    b = textquality.keyword_topk(docs.repartition(9), ["window"], k=5).collect()
    assert len(a) == 5
    assert [tuple(r) for r in a] == [tuple(r) for r in b], "partition-invariant top-k"
