from __future__ import annotations

import os

import pytest

# Keep test JVMs small and deterministic.
os.environ.setdefault("TLDR_SPARK_DRIVER_MEM", "4g")


@pytest.fixture(scope="session")
def spark():
    from tldr_spark.session import build_session

    s = build_session("tldr-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="module", autouse=True)
def _clear_spark_cache_between_modules():
    """The 250+-test suite shares one 4g JVM; cached/locally-checkpointed
    blocks accumulate across modules and can starve late modules of
    execution memory (observed: UNABLE_TO_ACQUIRE_MEMORY in test_sinks
    after the round-4 module grew). Dropping the cache at module teardown
    keeps each module's memory footprint independent."""
    yield
    try:
        from pyspark.sql import SparkSession

        s = SparkSession.getActiveSession()
        if s is not None:
            s.catalog.clearCache()
            s.sparkContext._jvm.System.gc()
    except Exception:  # session already stopped or JVM gone
        pass


REFERENCE_DIR = "/root/reference"


def reference_fixture(name: str) -> str:
    path = os.path.join(REFERENCE_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"reference fixture {name} not available")
    with open(path, encoding="utf-8") as f:
        return f.read()
