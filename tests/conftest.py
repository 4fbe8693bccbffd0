from __future__ import annotations

import os

import pytest

from tiledspark.session import get_spark
from tiledspark import synth

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SYNTH_CACHE = os.path.join(os.path.dirname(__file__), "..", ".synth_cache")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="tiledspark-tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def pages_path():
    return synth.ensure_pages(SYNTH_CACHE, 5_000)


@pytest.fixture(scope="session")
def zones_path():
    return synth.ensure_zones(SYNTH_CACHE)


@pytest.fixture(scope="session")
def sf_dir():
    return os.path.join(TESTDATA, "sf0.001")
