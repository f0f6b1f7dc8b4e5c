"""Shared fixtures: one local SparkSession per test run (hermetic —
replaces the reference's live-SQL-Server dependency, SURVEY.md §5)."""

from __future__ import annotations

import os
import shutil
import uuid

import pytest

from mssql_dataframe_spark import SparkEngine, connect

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SCRATCH = os.path.join(os.path.dirname(__file__), "..", ".spark_tables", "pytest")


@pytest.fixture(scope="session")
def spark():
    s = connect(app_name="pytest", shuffle_partitions=8)
    yield s


@pytest.fixture()
def engine(spark):
    root = os.path.join(SCRATCH, uuid.uuid4().hex)
    eng = SparkEngine(spark=spark, store_root=root)
    yield eng
    shutil.rmtree(root, ignore_errors=True)


@pytest.fixture()
def engine_ts(spark):
    root = os.path.join(SCRATCH, uuid.uuid4().hex)
    eng = SparkEngine(spark=spark, store_root=root, include_metadata_timestamps=True)
    yield eng
    shutil.rmtree(root, ignore_errors=True)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
