"""Semantic laws for the r4q wave: Croston forecast + binseg changepoint."""

from __future__ import annotations

import datetime as dt

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _write_lineitem(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, "
        "l_linenumber BIGINT, l_quantity DOUBLE, l_extendedprice DOUBLE, "
        "l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING, "
        "l_linestatus STRING, l_shipdate TIMESTAMP",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")


def test_croston_hand_computed_recursion(spark, tmp_path):
    # part 1: demand 8 on day 0, 4 on day 4, 4 on day 8 (gaps 4, 4)
    days = [0, 4, 8]
    rows = [
        (i + 1, 1, 1, 1, [8.0, 4.0, 4.0][i], 10.0, 0.0, 0.0, "N", "O",
         dt.datetime(2024, 1, 1) + dt.timedelta(days=d))
        for i, d in enumerate(days)
    ]
    _write_lineitem(spark, tmp_path, rows)
    out = (
        REGISTRY["ts_croston"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    # init: z=8, p=1; then z += .25(4-8) -> 7 -> 6.25; p += .25(4-1)
    assert list(out["z_size"]) == [8.0, 7.0, 6.25]
    assert list(out["p_interval"]) == [1.0, 1.75, 2.3125]
    assert abs(out["demand_rate"].iloc[2] - round(6.25 / 2.3125, 4)) < 1e-9


def test_croston_series_are_independent(spark, tmp_path):
    rows = [
        (1, 1, 1, 1, 10.0, 1.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 1)),
        (2, 2, 1, 1, 99.0, 1.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 2, 1)),
        (3, 1, 1, 1, 20.0, 1.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 9)),
    ]
    _write_lineitem(spark, tmp_path, rows)
    out = REGISTRY["ts_croston"].spark(spark, str(tmp_path)).toPandas()
    # part 2's lone demand initializes fresh, untouched by part 1
    p2 = out[out["part"] == 2].iloc[0]
    assert p2["z_size"] == 99.0 and p2["p_interval"] == 1.0
    p1 = out[(out["part"] == 1)].sort_values("day").iloc[1]
    assert p1["gap"] == 8


def _write_daily_orders(spark, tmp_path, day_cents):
    rows = [
        (i + 1, 1, "O", c / 100.0, dt.date(2024, 1, 1) + dt.timedelta(days=i),
         "3-MEDIUM")
        for i, c in enumerate(day_cents)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate DATE, o_orderpriority STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")


def test_binseg_finds_planted_level_shift(spark, tmp_path):
    cents = [10000] * 20 + [30000] * 20
    _write_daily_orders(spark, tmp_path, cents)
    out = REGISTRY["ts_changepoint_binseg"].spark(spark, str(tmp_path)).toPandas()
    best = out.iloc[0]
    # the best split is exactly the last day of the low regime
    assert best["split_day"] == dt.date(2024, 1, 20)
    assert best["n_left"] == 20 and best["n_right"] == 20
    assert best["mean_left"] == 100.0 and best["mean_right"] == 300.0
    # and it strictly dominates the runners-up
    assert best["gain_q"] > out["gain_q"].iloc[1]


def test_binseg_flat_series_gains_nothing(spark, tmp_path):
    _write_daily_orders(spark, tmp_path, [5000] * 30)
    out = REGISTRY["ts_changepoint_binseg"].spark(spark, str(tmp_path)).toPandas()
    assert (out["gain_q"] == 0).all()
    # admissibility: every candidate respects the min segment length
    assert (out["n_left"] >= 7).all() and (out["n_right"] >= 7).all()
