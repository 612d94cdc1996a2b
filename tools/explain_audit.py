"""Physical-plan audit: print `explain(formatted)` evidence for the plan
properties the engine relies on (SURVEY.md §4.2) and grep-check each claim.

Checks:
  - q1 scan: filter pushed + only needed columns read + whole-stage codegen;
  - j1: broadcast hash join chosen for the dim side;
  - l1 top-k: TakeOrderedAndProject (never a global sort);
  - j5: anti-join present, no cartesian;
  - w1/w2: single window sort, no extra exchange after the rank filter;
  - crawl politeness pick: salted lane window before per-host window.

Usage: PYTHONPATH=/root/repo python tools/explain_audit.py [sf_dir]
Exit code != 0 if any claim fails.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from crawler_service_spark.plans.bucketing import plan_string as formatted
from crawler_service_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


CLAIMS = {
    "q1_pricing_summary": [
        (r"PushedFilters: \[.*LessThan\(l_shipdate", "shipdate filter pushed to parquet"),
        (r"ReadSchema: [^\n]*l_returnflag", "column pruning keeps needed col"),
    ],
    "j1_broadcast_enrich": [
        (r"BroadcastHashJoin", "dim side broadcast"),
        (r"HashAggregate", "partial+final hash agg"),
    ],
    "l1_topk": [
        (r"TakeOrderedAndProject", "top-k without global sort"),
    ],
    "j5_seen_antijoin": [
        (r"LeftAnti", "anti-join strategy"),
        (r"PushedFilters: \[.*GreaterThan\(p_size", "p_size filter pushed"),
    ],
    "w1_politeness_rank": [
        (r"Window", "window rank"),
        (r"row_number", "row_number not full rank-sort"),
    ],
    "s1_scan_filter": [
        (r"PushedFilters: \[.*GreaterThan\(l_quantity", "quantity filter pushed"),
    ],
    "ann_cosine_topk": [
        (r"TakeOrderedAndProject", "integer-cosine top-k without global sort"),
    ],
    "dedup_minhash_verified": [
        (r"HashAggregate", "candidate-only intersection aggregates"),
    ],
    "ann_pq_topk": [
        (r"TakeOrderedAndProject", "ADC top-k without global sort"),
    ],
    "dedup_chunks": [
        (r"Window", "first-occurrence via per-hash window"),
        (r"row_number", "row_number, not full sort"),
    ],
    "text_decontaminate": [
        (r"BroadcastHashJoin", "eval-shingle set broadcasts; corpus never shuffles on shingle"),
    ],
    "text_keyword_topk": [
        (r"TakeOrderedAndProject", "top-k without global sort"),
        (r"BroadcastNestedLoopJoin|BroadcastHashJoin", "single global-stats row broadcast"),
    ],
    "sessionize_events": [
        (r"Window", "lag/sum windows share one user_id shuffle"),
    ],
    "pipeline_training_mix": [
        (r"BroadcastHashJoin", "eval-shingle set + semi joins broadcast"),
        (r"PushedFilters: \[.*doc_id", "bench/corpus split pushed to the scan"),
    ],
    "pipeline_training_mix_semantic": [
        (r"BroadcastHashJoin", "eval-shingle set + semi joins broadcast"),
        (r"PushedFilters: \[.*doc_id", "bench/corpus split pushed to the scan"),
        (r"LeftAnti", "semantic drop list anti-joined"),
    ],
    "pipeline_training_mix_full": [
        (r"BroadcastHashJoin", "eval-shingle set + semi joins broadcast"),
        (r"PushedFilters: \[.*doc_id", "bench/corpus split pushed to the scan"),
        (r"LeftAnti", "minhash + semantic drop lists anti-joined"),
    ],
    "multimodal_neardup_frames": [
        (r"PartitionFilters: \[[^\]]*bucket", "frame-index scan pruned to probed buckets"),
        (r"TakeOrderedAndProject", "indexed top-k without global sort"),
    ],
    "text_vocab_topk": [
        (r"TakeOrderedAndProject", "vocab top-k without global sort"),
    ],
    "pipeline_lm_buckets": [
        # the tercile cutoffs come back to the corpus as a broadcast, and the
        # only Window in the plan runs on the bounded (lang, lm_millis)
        # distribution frame — never a corpus-scale ntile sort
        (r"BroadcastHashJoin", "per-lang cutoffs broadcast back to the corpus"),
    ],
    "pipeline_pack_sequences": [
        # two-level scan: the bounded bucket-base frame joins back as a
        # broadcast; the corpus-side window is PARTITION BY bucket (parallel)
        (r"BroadcastHashJoin", "bucket base offsets broadcast back to the corpus"),
        (r"Window", "per-bucket prefix window present"),
    ],
    "text_dup_span_scrub": [
        (r"HashAggregate", "n-gram doc-frequency aggregates map-side"),
    ],
    "crawl_recrawl_schedule": [
        (r"Window", "lag window over the url key"),
    ],
    "graph_triangle_counts": [
        # wedge enumeration and closure are equi-joins; no nested-loop join
        (r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin", "wedge/closure equi-joins"),
    ],
    "pipeline_length_percentiles": [
        # the window runs on the bounded (lang, length) frame after the
        # map-side-combined length rollup — one corpus aggregate, no ntile
        (r"HashAggregate", "length distribution aggregates map-side"),
        (r"Window", "cumulative window on the bounded frame"),
    ],
    "events_range_activation": [
        # the interval predicate must execute as an EQUI hash join on
        # (key, cell), never a BroadcastNestedLoopJoin theta join
        (r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin", "equi-join on (key, cell)"),
    ],
    "events_asof_attribution": [
        # the as-of composition is ONE carry-forward window over the
        # unioned frame — no BroadcastNestedLoopJoin / theta-join blow-up
        (r"Window", "last(ignorenulls) carry-forward window"),
        (r"Union", "tagged probe/state union-merge"),
    ],
    "crawl_budget_allocation": [
        # the only unpartitioned window runs over the bucket-count frame;
        # the host-frame window is PARTITION BY bucket (parallel)
        (r"BroadcastHashJoin|BroadcastNestedLoopJoin", "total/leftover rows broadcast"),
        (r"Window", "two-level remainder-rank windows"),
    ],
    "text_postings": [
        # both aggregations hash-aggregate (map-side combine); postings
        # order comes from array_sort inside the group, not a global Sort
        (r"HashAggregate", "tf + term rollup aggregate map-side"),
    ],
    "text_tfidf_topk": [
        # tf and df aggregate map-side; the only Window is the per-doc top-k
        (r"HashAggregate", "tf/df aggregate with map-side combine"),
        (r"Window", "per-doc top-k window"),
    ],
    "text_nb_classify": [
        # the per-label constants frame (|labels| rows) broadcasts back to
        # the corpus; the only Window is the per-doc argmax
        (r"BroadcastHashJoin|BroadcastNestedLoopJoin", "label-constants frame broadcast"),
        (r"Window", "per-doc argmax window"),
    ],
}


def main() -> int:
    spark = get_spark("explain-audit", cpus=4, shuffle_partitions=4)
    qs = entrymod.queries()
    failures = []
    for name, claims in CLAIMS.items():
        plan = formatted(qs[name](spark, SF_DIR))
        for pat, why in claims:
            ok = re.search(pat, plan) is not None
            print(f"{'OK  ' if ok else 'FAIL'} {name}: {why}")
            if not ok:
                failures.append((name, why))
                print(plan)
    # whole-stage codegen is only visible on the post-AQE FINAL plan: run the
    # query, then look for the codegen stars in the executed plan
    cg = qs["q1_pricing_summary"](spark, SF_DIR)
    cg.collect()
    final = cg._jdf.queryExecution().executedPlan().toString()
    if re.search(r"\*\(\d+\)", final):
        print("OK   q1_pricing_summary: whole-stage codegen active in final plan")
    else:
        failures.append(("q1_pricing_summary", "whole-stage codegen active"))
        print("FAIL q1_pricing_summary: no codegen stages in final plan")
        print(final)

    # persisted ANN index query paths: the whole point is what is ABSENT
    # from the plan — no corpus re-assign/re-encode, scan pruned to the
    # probed lists / the codes table
    import tempfile

    from pyspark.sql import functions as F

    from crawler_service_spark.operators import ann_index
    from crawler_service_spark.storage.catalog import ManifestCatalog

    with tempfile.TemporaryDirectory() as td:
        cat = ManifestCatalog(td, spark)
        qdf = entrymod._quantized(spark, SF_DIR)
        qvec = entrymod._query_qvec(spark, SF_DIR)
        ann_index.build_ivf_index(cat, qdf, n_lists=16, refine=1)
        ann_index.build_pq_index(cat, qdf, n_subspaces=8, n_codes=16, refine=1)
        ivf_plan = formatted(ann_index.ivf_topk_indexed(cat, qvec, k=10, n_probe=2))
        why = "probed lists prune partitions"
        if re.search(r"PartitionFilters: \[[^\]]*list_id", ivf_plan):
            print(f"OK   ivf_topk_indexed: {why}")
        else:
            failures.append(("ivf_topk_indexed", why))
            print(f"FAIL ivf_topk_indexed: {why}")
            print(ivf_plan)
        ann_index.build_lsh_index(cat, qdf, n_planes=8)
        lsh_plan = formatted(ann_index.lsh_topk_indexed(cat, qvec, k=10, probe_radius=1))
        why = "probed buckets prune partitions"
        if re.search(r"PartitionFilters: \[[^\]]*bucket", lsh_plan):
            print(f"OK   lsh_topk_indexed: {why}")
        else:
            failures.append(("lsh_topk_indexed", why))
            print(f"FAIL lsh_topk_indexed: {why}")
            print(lsh_plan)
        pq_plan = formatted(ann_index.pq_topk_indexed(cat, qvec, k=10))
        for plan, name in (
            (ivf_plan, "ivf_topk_indexed"),
            (lsh_plan, "lsh_topk_indexed"),
            (pq_plan, "pq_topk_indexed"),
        ):
            bad = [m for m in ("ArrowEvalPython", "mapInPandas", "BatchEvalPython") if m in plan]
            if bad:
                failures.append((name, f"re-encode stage in indexed scan: {bad}"))
                print(f"FAIL {name}: indexed scan re-encodes ({bad})")
                print(plan)
            else:
                print(f"OK   {name}: no corpus re-encode in the indexed scan")
        if "TakeOrderedAndProject" in pq_plan:
            print("OK   pq_topk_indexed: ADC top-k without global sort")
        else:
            failures.append(("pq_topk_indexed", "TakeOrderedAndProject"))
            print(pq_plan)

    # spider-trap per-template cap (operators/traps.py): the whole design is
    # the plan shape — rank-limit pruning before both exchanges and the
    # output distinct riding the window's partitioning, so a trap template
    # never funnels into one reducer and the corpus shuffles exactly twice
    from crawler_service_spark.operators.traps import cap_per_template

    urls = spark.createDataFrame(
        [(f"http://h{i % 3}.example.com/p/{i}",) for i in range(64)],
        "url string",
    )
    cap_plan = formatted(cap_per_template(urls, k=5))
    why = "map-side WindowGroupLimit prunes before the shuffle"
    if "WindowGroupLimit" in cap_plan:
        print(f"OK   trap_cap_per_template: {why}")
    else:
        failures.append(("trap_cap_per_template", why))
        print(f"FAIL trap_cap_per_template: {why}")
        print(cap_plan)
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", cap_plan))
    why = f"at most two exchanges (got {n_exchanges})"
    if n_exchanges <= 2 and "CartesianProduct" not in cap_plan:
        print(f"OK   trap_cap_per_template: {why}, no cartesian")
    else:
        failures.append(("trap_cap_per_template", why))
        print(f"FAIL trap_cap_per_template: {why}")
        print(cap_plan)

    # anchor-text rollup (operators/extraction.py): count agg map-side
    # combined, rank filter gets WindowGroupLimit pruning, no cartesian
    from crawler_service_spark.operators.extraction import (
        anchor_text_topk,
        extract_anchor_links,
    )

    pages = spark.createDataFrame(
        [
            (f"http://s.example.com/{i}",
             f'<html><a href="http://t.example.com/{i % 4}">doc {i % 2}</a></html>'.encode())
            for i in range(32)
        ],
        "url string, html binary",
    )
    anchor_plan = formatted(anchor_text_topk(extract_anchor_links(pages), k=3))
    ok = (
        "WindowGroupLimit" in anchor_plan
        and "CartesianProduct" not in anchor_plan
        and not any(m in anchor_plan for m in ("ArrowEvalPython", "BatchEvalPython"))
    )
    why = "rank-limit pruning, no cartesian, no Python stage"
    if ok:
        print(f"OK   anchor_text_topk: {why}")
    else:
        failures.append(("anchor_text_topk", why))
        print(f"FAIL anchor_text_topk: {why}")
        print(anchor_plan)

    # negative check: no CartesianProduct anywhere except the intentional
    # all-pairs embedding query
    for name in ["q1_pricing_summary", "j1_broadcast_enrich", "j5_seen_antijoin",
                 "j4_prefix_theta_antijoin", "dedup_minhash_lsh",
                 "dedup_minhash_verified", "dedup_embedding_lsh", "ann_lsh_topk",
                 "dedup_minhash_cluster", "dedup_incremental", "ann_pq_topk",
                 "pipeline_training_mix_semantic", "multimodal_neardup_frames",
                 "pipeline_lm_buckets", "dedup_cluster_histogram", "pipeline_training_mix_full",
                 "graph_pagerank", "text_dup_ngram_coverage",
                 "embedding_label_centroids", "text_winnow_fingerprints",
                 "pipeline_pack_sequences", "crawl_redirect_resolve",
                 "text_dup_span_scrub", "crawl_recrawl_schedule"]:
        plan = formatted(qs[name](spark, SF_DIR))
        if "CartesianProduct" in plan:
            failures.append((name, "unexpected cartesian product"))
            print(f"FAIL {name}: unexpected CartesianProduct")
        else:
            print(f"OK   {name}: no cartesian product")
    print("FAILED:", failures or "none")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
