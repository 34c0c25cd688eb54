"""Shared fixtures: one SparkSession per test session, oracle connections."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from twitter_kafka_etl_spark.plans.oracle import duckdb_connection
from twitter_kafka_etl_spark.session import get_spark

SF_DIR = os.environ.get("TKES_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tkes-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def oracle_con(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()
