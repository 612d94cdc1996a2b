"""Family emission (SURVEY.md §2.9 G3/G4): extraction-job envelopes must be
byte-stable JSON — identical across runs and partitionings, keys sorted —
because the reference contract is "emits extraction-job metadata exactly".
"""

from __future__ import annotations

import json

from crawler_service_spark.operators.grouping import emit_extraction_jobs

ROWS = [
    ("crawl-1", f"https://h{i % 3}.com/dir{i % 4}/f{i}.{ext}", i, f"<html>{'x' * i}</html>".encode())
    for i, ext in enumerate(["txt", "csv", "zip", "png", "bin"] * 8)
]
SCHEMA = "crawl_id string, url string, seq long, html binary"


def jobs_map(df):
    return {r["family_id"]: r for r in df.collect()}


def test_payload_json_byte_stable_across_partitioning(spark):
    fetched = spark.createDataFrame(ROWS, SCHEMA)
    a = jobs_map(emit_extraction_jobs(fetched.repartition(1), 3))
    b = jobs_map(emit_extraction_jobs(fetched.repartition(7), 3))
    assert a.keys() == b.keys() and len(a) > 1
    for fid in a:
        assert a[fid]["payload_json"] == b[fid]["payload_json"]
        assert a[fid]["family_seq"] == b[fid]["family_seq"]


def test_payload_json_shape(spark):
    fetched = spark.createDataFrame(ROWS, SCHEMA)
    for r in emit_extraction_jobs(fetched, 1).collect():
        payload = json.loads(r["payload_json"])
        # sorted-key order == byte stability under any JSON re-serialization
        assert list(payload) == sorted(payload)
        assert payload["family_id"] == r["family_id"]
        assert payload["group"]["num_files"] == len(payload["files"])
        paths = [f["path"] for f in payload["files"]]
        assert paths == sorted(paths)  # deterministic in-array order
        assert payload["group"]["parser"] == r["parser"]


def test_family_seq_is_min_member_seq(spark):
    fetched = spark.createDataFrame(ROWS, SCHEMA)
    seq_by_url = {u: s for _, u, s, _ in ROWS}
    for r in emit_extraction_jobs(fetched, 1).collect():
        member_seqs = [seq_by_url[f["path"]] for f in json.loads(r["payload_json"])["files"]]
        assert r["family_seq"] == min(member_seqs)
