"""Shared test fixtures: one local SparkSession per test session."""

from __future__ import annotations

import pytest

from clif_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="clif-spark-tests", master="local[4]",
                      shuffle_partitions=4)
    yield s
    s.stop()
