"""Shared Spark fixture: one session for the whole suite (JVM start ~10s)."""

from __future__ import annotations

import pytest

from spider_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="spider-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
