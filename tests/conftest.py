from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from ipes_data_pipeline_spark.session import get_session

    s = get_session("ipes-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
