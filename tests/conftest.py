"""Shared fixtures: one local SparkSession per test run, one DuckDB
connection with the warehouse views registered (mirrors the driver's
oracle harness)."""

from __future__ import annotations

import duckdb
import pytest

from gcp_de_data_pipeline_cc_spark.catalog import TABLES
from gcp_de_data_pipeline_cc_spark.session import build_session

# small sf keeps the full differential suite fast; the driver re-runs the
# same comparisons at sf0.01
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = build_session(
        app_name="tests",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false", "spark.sql.warehouse.dir": "/tmp/spark-warehouse-tests"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()
