from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session", autouse=True)
def _testdata_drift_gate():
    """Fail the whole session loudly if /root/testdata drifted from the
    committed schema snapshot — BEFORE any query runs (drift silently
    killed round 3's correctness gate).  SPARK_GRAFT_SKIP_DRIFT_CHECK=1
    overrides."""
    from hbase_tohdfs_spark.drift import check_or_raise

    try:
        check_or_raise()
    except RuntimeError as exc:
        pytest.exit(str(exc), returncode=1)


@pytest.fixture(scope="session")
def spark():
    from hbase_tohdfs_spark.session import get_spark

    spark = get_spark(app_name="tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
