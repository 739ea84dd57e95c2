"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ir_analyses_spark.session import get_spark  # noqa: E402
from ir_analyses_spark.streaming.pbvendor import ensure_protobuf_driver  # noqa: E402

# Before ANY SparkSession (and its JVM) exists: transformWithState's
# pre-init driver worker inherits PYTHONPATH from the JVM environment,
# so the vendored protobuf shim must be exported here, at conftest
# import time, for the tws protocol tests to execute (no-op when the
# real protobuf is installed).
ensure_protobuf_driver()

SF_SMOKE = "/root/testdata/sf0.001"
# the driver's correctness SF is sf0.01; run this suite against it with
#   TEST_SF_DIR=/root/testdata/sf0.01 python -m pytest tests/
# (the verify recipe in .claude/skills/verify replays that protocol too)


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="ir_analyses_spark_tests", cpus=8, shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("TEST_SF_DIR", SF_SMOKE)
