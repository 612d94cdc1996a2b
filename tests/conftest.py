from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_service_spark.fixtures import FixtureSpec, generate_fixture
from crawler_service_spark.session import get_spark

SMALL_SPEC = FixtureSpec(n_pages=240, n_hosts=8, n_seeds=3)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("crawler-service-tests", cpus=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def small_fixture(tmp_path_factory):
    out = tmp_path_factory.mktemp("fixture-small")
    return generate_fixture(SMALL_SPEC, str(out))
