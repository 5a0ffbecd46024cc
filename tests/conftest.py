from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from real_time_stream_processing_engine_spark.session import get_spark

    # Small local session for tests: fewer threads/partitions = faster
    # startup and per-job overhead; the engine itself is partition-count
    # agnostic.  maxFailures=2 (the ",2") so fault-injection tests can
    # exercise task retry, parity with the reference's recovery demo.
    s = get_spark(
        app_name="rs-tests",
        master=f"local[{os.environ.get('SPARK_GRAFT_TEST_CPUS', '4')},2]",
        shuffle_partitions=8,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
