from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from sql2all_spark.session import get_spark
from sql2all_spark.tables import TABLE_NAMES

SF_DIR = "/root/testdata/sf0.001"  # unit tests run at the smallest SF


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
