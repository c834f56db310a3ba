"""Semantic laws for the r5j wave: point-in-time features + checksums."""

from __future__ import annotations

import datetime

import duckdb

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# --------------------------------------------------------------------------
# featurestore_point_in_time
# --------------------------------------------------------------------------


def test_pit_no_leakage_planted(spark, tmp_path):
    # one customer, orders on days 1, 5, 100: the day-100 label must see
    # prev=day-5 totals and a 90d count that EXCLUDES itself
    rows = [
        (20, 1, datetime.date(2024, 1, 1), 100.0),
        (40, 1, datetime.date(2024, 1, 5), 200.0),
        (60, 1, datetime.date(2024, 4, 9), 300.0),  # 95d after day 5
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderdate DATE, "
        "o_totalprice DOUBLE",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    out = (
        REGISTRY["featurestore_point_in_time"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .set_index("o_orderkey")
    )
    # first order: no history
    assert out.loc[20].feat_orders_90d == 0
    assert out.loc[20].isna().feat_prev_total_cents
    # second order: sees exactly the first
    assert out.loc[40].feat_prev_total_cents == 10000
    assert out.loc[40].feat_days_since_prev == 4
    assert out.loc[40].feat_orders_90d == 1
    # third order: prev exists but is outside the 90d window
    assert out.loc[60].feat_prev_total_cents == 20000
    assert out.loc[60].feat_orders_90d == 0


def test_pit_sf_feature_recompute(spark):
    out = REGISTRY["featurestore_point_in_time"].spark(spark, SF_DIR).toPandas()
    assert (out.o_orderkey % 20 == 0).all()
    # recompute one customer's features from raw orders
    src = duckdb.sql(
        f"SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice "
        f"FROM '{SF_DIR}/orders.parquet'"
    ).df()
    cust = out.o_custkey.iloc[0]
    hist = src[src.o_custkey == cust].sort_values(
        ["o_orderdate", "o_orderkey"]
    )
    sub = out[out.o_custkey == cust]
    for _, r in sub.iterrows():
        before = hist[
            (hist.o_orderdate < r.label_date)
            | (
                (hist.o_orderdate == r.label_date)
                & (hist.o_orderkey < r.o_orderkey)
            )
        ]
        if len(before):
            prev = before.iloc[-1]
            assert r.feat_prev_total_cents == round(prev.o_totalprice * 100)
        else:
            assert r.feat_orders_90d == 0
        # window count: strictly-earlier DATES within 90 days
        ld = r.label_date
        n90 = (
            (hist.o_orderdate < ld)
            & (hist.o_orderdate >= ld - datetime.timedelta(days=90))
        ).sum()
        assert r.feat_orders_90d == n90


# --------------------------------------------------------------------------
# qc_checksum_chunks
# --------------------------------------------------------------------------


def test_checksums_detect_single_row_change(spark, tmp_path):
    rows = [(i, 1, float(i) + 0.25) for i in range(1, 201)]
    schema = "l_orderkey BIGINT, l_linenumber INT, l_extendedprice DOUBLE"
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmp_path}/a/lineitem.parquet"
    )
    # replica with ONE corrupted row
    rows2 = list(rows)
    rows2[57] = (rows2[57][0], rows2[57][1], rows2[57][2] + 0.01)
    spark.createDataFrame(rows2, schema).write.mode("overwrite").parquet(
        f"{tmp_path}/b/lineitem.parquet"
    )
    a = (
        REGISTRY["qc_checksum_chunks"]
        .spark(spark, f"{tmp_path}/a")
        .toPandas()
        .set_index("chunk")
    )
    b = (
        REGISTRY["qc_checksum_chunks"]
        .spark(spark, f"{tmp_path}/b")
        .toPandas()
        .set_index("chunk")
    )
    diff = a.compare(b)
    # exactly the corrupted row's chunk differs, on both checksums
    assert list(diff.index) == [rows2[57][0] % 16]
    assert (a.n_rows == b.n_rows).all()


def test_checksums_order_insensitive(spark, tmp_path):
    rows = [(i, 1, float(i)) for i in range(1, 101)]
    schema = "l_orderkey BIGINT, l_linenumber INT, l_extendedprice DOUBLE"
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmp_path}/f/lineitem.parquet"
    )
    spark.createDataFrame(rows[::-1], schema).repartition(7).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/r/lineitem.parquet")
    a = (
        REGISTRY["qc_checksum_chunks"].spark(spark, f"{tmp_path}/f").toPandas()
        .sort_values("chunk").reset_index(drop=True)
    )
    b = (
        REGISTRY["qc_checksum_chunks"].spark(spark, f"{tmp_path}/r").toPandas()
        .sort_values("chunk").reset_index(drop=True)
    )
    assert a.equals(b)
