"""Connector-config construction tests (no network, no connector jars —
only the configuration the deploy target consumes)."""

from __future__ import annotations

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.sources.connectors import (
    GCS_SESSION_CONFS,
    WarehouseLocation,
    bigquery_writer,
)
from tests.conftest import SF_DIR


def test_tier_paths_over_schemes():
    local = WarehouseLocation("file:///tmp/wh")
    gcs = WarehouseLocation("gs://my-bucket/warehouse/")
    assert local.tier_path("raw", "Employee_raw") == "file:///tmp/wh/raw/Employee_raw"
    assert gcs.tier_path("cur", "EmployeeDepartment_cur") == (
        "gs://my-bucket/warehouse/cur/EmployeeDepartment_cur"
    )


def test_gcs_confs_shape():
    assert all(k.startswith("spark.hadoop.") for k in GCS_SESSION_CONFS)


def test_bigquery_writer_is_configured_not_executed(spark):
    df = load_table(spark, SF_DIR, "nation")
    w = bigquery_writer(df, "proj.dataset.nation", "tmp-bucket")
    # construction succeeds without the connector jar; saving would need it
    assert w is not None


def test_custom_datasource_parallel_partitions(spark):
    """The custom source must plan one task per range partition — a
    single-partition read would funnel generation through one executor."""
    from gcp_de_data_pipeline_cc_spark.sources.synthetic import (
        SyntheticRowsDataSource,
    )

    try:
        spark.dataSource.register(SyntheticRowsDataSource)
    except Exception:
        pass
    df = (
        spark.read.format("synthetic_rows")
        .option("n", "1000")
        .option("num_partitions", "4")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1000
    # deterministic content: same read twice is identical
    a = sorted(r.score for r in df.collect())
    b = sorted(r.score for r in df.collect())
    assert a == b
