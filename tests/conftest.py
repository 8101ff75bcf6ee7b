from __future__ import annotations

import os

import pytest

from stock_market_big_data_project_spark.session import get_spark

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s


@pytest.fixture(autouse=True)
def _gc_between_tests(request):
    """Trigger the JVM GC after each test so Spark's ContextCleaner reclaims
    finished shuffle/broadcast state (otherwise the suite degrades
    progressively — see session.py driver-memory note)."""
    yield
    if "spark" in request.fixturenames:
        request.getfixturevalue("spark").sparkContext._jvm.System.gc()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
