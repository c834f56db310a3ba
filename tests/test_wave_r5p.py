"""Semantic laws for the r5p wave: arrow UDAF + calendar dimension."""

from __future__ import annotations

import datetime

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_arrow_udaf_matches_builtin(spark):
    from pyspark.sql import functions as F

    out = REGISTRY["udaf_arrow_grouped"].spark(spark, SF_DIR).toPandas()
    builtin = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
            )
            .cast("long")
            .alias("revenue_cents"),
        )
        .orderBy("o_orderpriority")
        .toPandas()
    )
    assert out.reset_index(drop=True).equals(builtin.reset_index(drop=True))


def test_calendar_dimension_laws(spark):
    out = REGISTRY["dim_calendar_build"].spark(spark, SF_DIR).toPandas()
    # dense spine: consecutive days, no gaps
    days = sorted(out.d)
    assert (days[-1] - days[0]).days + 1 == len(out)
    assert out.d.is_unique
    for _, r in out.head(400).iterrows():
        d = r.d
        assert r.year == d.year and r.month == d.month
        assert r.quarter == (d.month + 2) // 3
        assert r.dow_iso == d.isoweekday()
        assert r.is_weekend == int(d.isoweekday() >= 6)
        expect_fy = d.year if d.month >= 2 else d.year - 1
        assert r.fiscal_year == expect_fy
        fw = min((d - datetime.date(expect_fy, 2, 1)).days // 7, 51)
        assert r.fiscal_quarter == fw // 13 + 1
        wq = fw % 13
        p = 1 if wq < 4 else (2 if wq < 8 else 3)
        assert r.fiscal_period_445 == (fw // 13) * 3 + p
    # fiscal invariants: 4 quarters x 3 periods, periods nested in
    # quarters
    assert set(out.fiscal_quarter) <= {1, 2, 3, 4}
    assert (
        ((out.fiscal_period_445 - 1) // 3 + 1) == out.fiscal_quarter
    ).all()
    # holiday flags fire exactly on the fixed dates present in the span
    hol = out[out.is_fixed_holiday == 1]
    assert all(
        (d.month, d.day) in {(1, 1), (7, 4), (12, 25)} for d in hol.d
    )
