from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_lake_skyfit_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_GATE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("skyfit-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SKYFIT_TEST_SF_DIR", SF_GATE)
