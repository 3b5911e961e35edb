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


REFERENCE_DIR = "/root/reference"


def reference_fixture(name: str) -> str:
    path = os.path.join(REFERENCE_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"reference fixture {name} not available")
    with open(path, encoding="utf-8") as f:
        return f.read()
