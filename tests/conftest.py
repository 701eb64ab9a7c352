from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from gis_city_county_spark.session import get_spark

    s = get_spark(app_name="gis-city-county-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def pytest_configure(config):
    # `fast` marks the window-sized gate set (plan-quality, scale,
    # contract shapes, bench contract): `pytest tests/ -m fast -q`
    # completes in minutes, so an external verify window that cannot
    # fit the full suite (~43 min) still gets a completed run with a
    # summary line (r12 verdict item 6).
    config.addinivalue_line(
        "markers", "fast: window-sized gate tests (plan/contract/scale)"
    )
