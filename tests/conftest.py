from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from weather_database_system_spark.session import get_spark

    spark = get_spark(app_name="wdss-tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(autouse=True)
def _release_persisted_intermediates():
    """Persist-lifecycle contract (session.track_persisted): the caller that
    owns the terminal action releases operator-persisted intermediates; for
    tests that's after every test function."""
    yield
    from weather_database_system_spark.session import release_persisted

    release_persisted()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()
