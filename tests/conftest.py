from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_service_spark.fixtures import FixtureSpec, generate_fixture
from crawler_service_spark.session import get_spark

SMALL_SPEC = FixtureSpec(n_pages=240, n_hosts=8, n_seeds=3)
TINY_SPEC = FixtureSpec(n_pages=60, n_hosts=5, n_seeds=2)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("crawler-service-tests", cpus=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def small_fixture(tmp_path_factory):
    out = tmp_path_factory.mktemp("fixture-small")
    return generate_fixture(SMALL_SPEC, str(out))


@pytest.fixture(scope="session")
def tiny_fixture(tmp_path_factory):
    out = tmp_path_factory.mktemp("fixture-tiny")
    return generate_fixture(TINY_SPEC, str(out))


def engine_snapshot(eng):
    """Comparable full-state snapshot of a finished (or mid-flight) crawl."""
    seen = sorted(
        (r["url_hash"], r["url"], r["seq"])
        for r in eng.catalog.read("seen").collect()
    )
    order = sorted(
        (r["iteration"], r["seq"], r["depth"], r["url"])
        for r in eng.catalog.read("crawl_order").collect()
    )
    texts = sorted(
        (r["url"], r["text"]) for r in eng.catalog.read("pages_out").collect()
    )
    st = eng.last_state()
    return {
        "seen": seen,
        "order": order,
        "texts": texts,
        "state": (int(st["iteration"]), st["status"], int(st["next_seq"])),
    }
