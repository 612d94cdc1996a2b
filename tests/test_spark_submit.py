"""`spark-submit --py-files` deployment smoke test — the north rule's
literal run mode ("run via spark-submit --py-files on a multi-executor
cluster", BASELINE.json). In-sandbox evidence: the package is zipped, the
job runs from a NEUTRAL working directory with the repo stripped from
PYTHONPATH — so the driver AND the Python workers can resolve
``crawler_service_spark`` only through the ``--py-files`` zip — and the
job's crawl output must match the same crawl run in-process:

- a full BFS crawl over a deterministic fixture (crawl order + seen set),
- a pandas-UDF stage (``extraction.extract_text``) so an EXECUTOR Python
  worker must import package code from the zip (the failure mode the verify
  recipe warns about: ModuleNotFoundError inside the Arrow worker).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile
from pathlib import Path

import pyspark

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = Path(pyspark.__file__).parent / "bin" / "spark-submit"

JOB = """
import json, sys
from pyspark.sql import SparkSession, functions as F

# the ONLY source for crawler_service_spark here is the --py-files zip
from crawler_service_spark.engine import CrawlConfig, CrawlEngine
from crawler_service_spark.fixtures import FixtureSpec, generate_fixture
from crawler_service_spark.operators.extraction import extract_text, extract_text_col

fixture_dir, workdir, out_path = sys.argv[1], sys.argv[2], sys.argv[3]

spark = (
    SparkSession.builder.master("local[4]")
    .appName("submit-smoke")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
paths = generate_fixture(FixtureSpec(n_pages=120, n_hosts=6, n_seeds=3, seed=11), fixture_dir)
pages = spark.read.parquet(paths["pages"])

# executor-side package import: the pandas UDF body runs inside a Python
# worker that must unpack crawler_service_spark from the py-files zip
udf_rows = (
    pages.select(extract_text("html").alias("a"), extract_text_col("html").alias("b"))
    .filter(F.col("a") != F.col("b"))
    .count()
)

eng = CrawlEngine(
    spark,
    pages=pages,
    robots=spark.read.parquet(paths["robots_rules"]),
    workdir=workdir,
    config=CrawlConfig(iteration_seconds=60.0),
)
eng.run(seeds=spark.read.parquet(paths["seeds"]))
order = [
    [r["iteration"], r["seq"], r["depth"], r["url"]]
    for r in eng.catalog.read("crawl_order").orderBy("iteration", "depth", "seq").collect()
]
seen = sorted(r["url"] for r in eng.catalog.read("seen").select("url").collect())
with open(out_path, "w") as f:
    json.dump({"udf_mismatches": udf_rows, "order": order, "seen": seen}, f)
spark.stop()
"""


def test_spark_submit_py_files_deployment(tmp_path):
    # package zip exactly as a cluster submit would ship it
    zip_path = tmp_path / "crawler_service_spark.zip"
    pkg = REPO / "crawler_service_spark"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(pkg.rglob("*.py")):
            z.write(p, p.relative_to(REPO))

    job_path = tmp_path / "job.py"
    job_path.write_text(JOB)
    fixture_dir = str(tmp_path / "fixture")
    workdir = str(tmp_path / "wd")
    out_path = tmp_path / "result.json"

    env = dict(os.environ)
    # strip every path that could leak the repo into the job: the zip must be
    # the only way the package resolves (driver and executors both)
    env["PYTHONPATH"] = ""
    env.pop("SPARK_HOME", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    proc = subprocess.run(
        [
            str(SPARK_SUBMIT),
            "--master", "local[4]",
            "--py-files", str(zip_path),
            str(job_path), fixture_dir, workdir, str(out_path),
        ],
        cwd=str(tmp_path),  # neutral cwd: '' on sys.path must not find the repo
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    got = json.loads(out_path.read_text())

    # executor workers imported package code from the zip and the JVM/pandas
    # extraction twins stayed byte-identical through it
    assert got["udf_mismatches"] == 0

    # parity: the submitted crawl equals the same crawl run in-process
    sys.path.insert(0, str(REPO / "tests"))
    from oracle import load_fixture, oracle_crawl

    paths = {
        "pages": os.path.join(fixture_dir, "pages.parquet"),
        "robots_rules": os.path.join(fixture_dir, "robots_rules.parquet"),
        "seeds": os.path.join(fixture_dir, "seeds.parquet"),
    }
    pages, seeds, robots = load_fixture(paths)
    o = oracle_crawl(pages, seeds, robots, iteration_seconds=60.0)
    assert [tuple(r) for r in got["order"]] == o.order
    assert set(got["seen"]) == o.seen
