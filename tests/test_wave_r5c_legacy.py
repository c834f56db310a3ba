"""Semantic laws for the r5c wave: DataFrame.transpose + SQL scripting."""

from __future__ import annotations

import duckdb

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def test_transpose_roundtrip_against_source(spark):
    out = (
        REGISTRY["df_transpose"].spark(spark, SF_DIR).toPandas()
        .set_index("key")
    )
    assert sorted(out.index) == ["n_customers", "n_nations", "n_suppliers"]
    assert sorted(out.columns) == sorted(REGIONS)
    # cross-check one cell family against a direct recompute
    nat = duckdb.sql(f"""
        SELECT r.r_name, COUNT(*) n FROM '{SF_DIR}/nation.parquet' n
        JOIN '{SF_DIR}/region.parquet' r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1""").fetchall()
    for r_name, n in nat:
        assert out.loc["n_nations", r_name] == n
    # every region has exactly 5 nations in TPC-H
    assert (out.loc["n_nations"] == 5).all()
    # customers and suppliers outnumber nations everywhere
    assert (out.loc["n_customers"] > out.loc["n_nations"]).all()


def test_transpose_is_involution_shapewise(spark):
    # transposing the transposed frame restores the original header set
    df = spark.createDataFrame(
        [("a", 1, 2), ("b", 3, 4)], "k string, x long, y long"
    )
    tt = df.transpose().transpose()
    assert set(tt.columns) == {"key", "x", "y"}


def test_scripting_power_of_two_capacity(spark):
    out = REGISTRY["sql_scripting"].spark(spark, SF_DIR).toPandas().iloc[0]
    n, cap, iters = out.n_days, out.cap, out.iters
    assert cap >= n
    assert cap == 2**iters
    assert iters == 0 or 2 ** (iters - 1) < n  # minimality
    src = duckdb.sql(
        f"SELECT COUNT(DISTINCT CAST(ts AS DATE)) FROM "
        f"'{SF_DIR}/events.parquet'"
    ).fetchone()[0]
    assert n == src


def test_scripting_variables_scoped_per_run(spark):
    # running the script twice must not leak variable state
    a = REGISTRY["sql_scripting"].spark(spark, SF_DIR).toPandas().iloc[0]
    b = REGISTRY["sql_scripting"].spark(spark, SF_DIR).toPandas().iloc[0]
    assert (a == b).all()
