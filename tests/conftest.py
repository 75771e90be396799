from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_cql_streaming_db_migrator_spark.session import build_session

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
