import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fixtures.generate import ensure_fixtures  # noqa: E402
from mxsparkg.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("local[4]", shuffle_partitions=8, app_name="mxsparkg-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_fixtures():
    return ensure_fixtures("tiny")


@pytest.fixture(scope="session")
def sf001():
    return "/root/testdata/sf0.001"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running full-gate checks (still run by default)"
    )
