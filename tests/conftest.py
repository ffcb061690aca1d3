"""Shared Spark session + helpers for the test suite.

One session-scoped local[*] SparkSession (FIXTURES.md: verify with
`python -m pytest -x -q`). Shuffle partitions kept small so tiny
fixtures don't pay 200-partition overhead.
"""

from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from nutch_spark.session import get_spark

    s = get_spark(cores=8, shuffle_partitions=8, app_name="nutch-spark-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


T0 = 1_700_000_000_000  # fixed simulated clock origin (ms epoch)


@pytest.fixture()
def t0():
    return T0
