"""Semantic laws for the r5k wave: duplicate-payment audit + period
detection."""

from __future__ import annotations

import datetime
import math

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# --------------------------------------------------------------------------
# qc_duplicate_payments
# --------------------------------------------------------------------------


def test_dup_payments_planted(spark, tmp_path):
    d = datetime.date
    rows = [
        # double-submit: same cust, same amount, next day -> flagged
        (1, 10, d(2024, 1, 1), 500.00),
        (2, 10, d(2024, 1, 2), 500.00),
        # fee-adjusted resubmit: 50 cents apart, same day -> flagged
        (3, 11, d(2024, 2, 1), 120.00),
        (4, 11, d(2024, 2, 1), 120.50),
        # same amounts but 30 days apart -> NOT flagged
        (5, 12, d(2024, 3, 1), 99.99),
        (6, 12, d(2024, 3, 31), 99.99),
        # close dates but $50 apart -> NOT flagged
        (7, 13, d(2024, 4, 1), 100.00),
        (8, 13, d(2024, 4, 2), 150.00),
        # different customers, identical otherwise -> NOT flagged
        (9, 14, d(2024, 5, 1), 75.00),
        (10, 15, d(2024, 5, 1), 75.00),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderdate DATE, "
        "o_totalprice DOUBLE",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    out = REGISTRY["qc_duplicate_payments"].spark(spark, str(tmp_path)).toPandas()
    got = set(zip(out.key_a, out.key_b))
    assert got == {(1, 2), (3, 4)}
    r = out.set_index("key_a")
    assert r.loc[1, "exact_amount"] == 1 and r.loc[1, "day_gap"] == 1
    assert r.loc[3, "exact_amount"] == 0
    assert r.loc[3, "amount_gap_cents"] == 50


def test_dup_payments_sf_band_invariants(spark):
    out = REGISTRY["qc_duplicate_payments"].spark(spark, SF_DIR).toPandas()
    if len(out):
        assert (out.amount_gap_cents <= 100).all()
        assert (out.day_gap <= 3).all()
        assert (out.key_a < out.key_b).all()
        assert (
            (out.exact_amount == 1) == (out.amount_gap_cents == 0)
        ).all()


# --------------------------------------------------------------------------
# ts_period_detect
# --------------------------------------------------------------------------


def test_period_detect_planted_weekly(spark, tmp_path):
    # strong 7-day cycle: the argmax must land on lag 7 (and 14, its
    # harmonic, must also correlate strongly but rank below or equal;
    # ties break on the smaller lag)
    rows = []
    day0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    for i in range(70):
        val = 900.0 if i % 7 == 0 else 100.0 + (i % 3)  # tiny off-cycle
        rows.append((i, 1, "view", day0 + datetime.timedelta(days=i), val, "s"))
    spark.createDataFrame(
        rows,
        "event_id BIGINT, user_id BIGINT, event_type STRING, "
        "ts TIMESTAMP, value DOUBLE, session_id STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = REGISTRY["ts_period_detect"].spark(spark, str(tmp_path)).toPandas()
    assert out.detected_period.iloc[0] == 7
    assert out[out.is_dominant == 1].lag_days.iloc[0] == 7
    assert len(out) == 13  # lags 2..14
    # the harmonic at 14 is also strongly positive
    assert out.set_index("lag_days").loc[14, "acf"] > 0.8


def test_period_detect_matches_numpy(spark):
    import duckdb
    import numpy as np

    out = (
        REGISTRY["ts_period_detect"].spark(spark, SF_DIR).toPandas()
        .set_index("lag_days")
    )
    src = duckdb.sql(f"""
        SELECT date_diff('day', DATE '1990-01-01', CAST(ts AS DATE)) dnum,
               SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) // 1000 v
        FROM '{SF_DIR}/events.parquet' GROUP BY 1 ORDER BY 1
    """).df()
    vals = dict(zip(src.dnum, src.v))
    for k in range(2, 15):
        xs, ys = [], []
        for dn, v in vals.items():
            if dn - k in vals:
                xs.append(float(v))
                ys.append(float(vals[dn - k]))
        r = np.corrcoef(xs, ys)[0, 1]
        assert abs(out.loc[k, "acf"] - r) < 1e-4
        assert out.loc[k, "n_pairs"] == len(xs)
