"""Semantic laws for the r4g wave: forecast backtest and Wilson
intervals."""

from __future__ import annotations

import datetime as dt
import math

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _ts(day: int, h: int = 12) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=day, hours=h)


# ------------------------------------------------------------ backtest

def test_backtest_linear_series_ols_wins(spark, tmp_path):
    # exact linear trend: OLS forecasts perfectly, naive is off by the
    # daily slope every day -> skill -> 1
    rows = [(d + 1, _ts(d), 1, "click", (1000 + 100 * d) / 100, "{}")
            for d in range(25)]
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    r = REGISTRY["ts_forecast_backtest"].spark(spark, str(tmp_path)).collect()[0]
    assert r.mae_naive == 100.0
    assert r.mae_ols <= 1.0           # perfect up to rounding
    assert r.skill_vs_naive >= 0.99


def test_backtest_fixture_consistency(spark):
    r = REGISTRY["ts_forecast_backtest"].spark(spark, SF_DIR).collect()[0]
    assert r.n_days > 0
    assert r.mae_naive > 0 and r.mae_ols > 0
    assert abs(r.skill_vs_naive - (1 - r.mae_ols / r.mae_naive)) < 1e-3


# -------------------------------------------------------------- wilson

def _wilson(k, n, z=1.959964):
    p = k / n
    denom = 1 + z * z / n
    center = p + z * z / (2 * n)
    halfw = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    return (center - halfw) / denom, (center + halfw) / denom


def test_wilson_matches_reference_formula(spark):
    out = REGISTRY["stats_wilson_interval"].spark(spark, SF_DIR).collect()
    assert len(out) == 5
    for r in out:
        lo, hi = _wilson(r.k, r.n)
        assert abs(r.ci_lo - lo) < 1e-5 and abs(r.ci_hi - hi) < 1e-5
        assert 0 <= r.ci_lo <= r.rate <= r.ci_hi <= 1


def test_wilson_zero_successes_stays_positive(spark, tmp_path):
    # the Wald interval at k=0 collapses to [0,0]; Wilson must not
    spark.createDataFrame(
        [(i + 1, 1, "O", 100.0, dt.date(2024, 1, 1), "1-URGENT")
         for i in range(20)],
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate DATE, o_orderpriority STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    r = REGISTRY["stats_wilson_interval"].spark(spark, str(tmp_path)).collect()[0]
    assert (r.n, r.k, r.rate) == (20, 0, 0.0)
    assert r.ci_lo == 0.0 and r.ci_hi > 0.1
