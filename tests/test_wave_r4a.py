"""Semantic laws for the r4a wave: rolling OLS and U-shape
attribution."""

from __future__ import annotations

import datetime as dt

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _ts(day: int, h: int = 12) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=day, hours=h)


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")


# --------------------------------------------------------------- ols

def test_ols_exact_linear_series(spark, tmp_path):
    # daily revenue rises exactly 100 cents/day -> slope is exactly 100
    rows = [(d + 1, _ts(d), 1, "click", (1000 + 100 * d) / 100, "{}")
            for d in range(20)]
    _write_events(spark, tmp_path, rows)
    out = REGISTRY["ts_rolling_ols"].spark(spark, str(tmp_path)).collect()
    for r in out:
        assert r.slope == 100.0
        assert r.forecast_next == r.cents + 100.0


def test_ols_constant_series(spark, tmp_path):
    rows = [(d + 1, _ts(d), 1, "click", 50.0, "{}") for d in range(10)]
    _write_events(spark, tmp_path, rows)
    out = REGISTRY["ts_rolling_ols"].spark(spark, str(tmp_path)).collect()
    for r in out:
        assert r.slope == 0.0 and r.intercept == 5000.0
        assert r.forecast_next == 5000.0


def test_ols_fixture_shape(spark):
    out = REGISTRY["ts_rolling_ols"].spark(spark, SF_DIR).collect()
    assert len(out) > 0
    for r in out:
        assert 2 <= r.n <= 14


# -------------------------------------------------------- attribution

def test_attribution_edge_rules(spark, tmp_path):
    rows = [
        # user 1: single touch -> 100%
        (1, _ts(0), 1, "view", 1.0, "{}"),
        (2, _ts(1), 1, "purchase", 1.0, "{}"),
        # user 2: two touches -> 50/50
        (3, _ts(0), 2, "view", 1.0, "{}"),
        (4, _ts(1), 2, "click", 1.0, "{}"),
        (5, _ts(2), 2, "purchase", 1.0, "{}"),
        # user 3: V,S,S,S,C -> 40 first(V) / 40 last(C) / 20 middles(S)
        # 3 middles: 66666+2 remainder to the first -> S gets 200000
        (6, _ts(0), 3, "view", 1.0, "{}"),
        (7, _ts(1), 3, "signup", 1.0, "{}"),
        (8, _ts(2), 3, "signup", 1.0, "{}"),
        (9, _ts(3), 3, "signup", 1.0, "{}"),
        (10, _ts(4), 3, "click", 1.0, "{}"),
        (11, _ts(5), 3, "purchase", 1.0, "{}"),
        # user 4: purchase with no prior touches -> excluded
        (12, _ts(0), 4, "purchase", 1.0, "{}"),
        # user 5: touches but no purchase -> excluded
        (13, _ts(0), 5, "view", 1.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    out = {r.channel: r for r in
           REGISTRY["attribution_position_based"].spark(spark, str(tmp_path))
           .collect()}
    assert set(out) == {"view", "click", "signup"}
    assert all(r.n_conversions == 3 for r in out.values())
    # view: 1000000 (u1) + 500000 (u2) + 400000 (u3)
    assert out["view"].credit_micro == 1_900_000
    # click: 500000 (u2) + 400000 (u3)
    assert out["click"].credit_micro == 900_000
    # signup: middles of u3 share 200000 exactly
    assert out["signup"].credit_micro == 200_000
    # conservation: all journeys sum to exactly 1e6 each
    assert sum(r.credit_micro for r in out.values()) == 3_000_000


def test_attribution_fixture_conservation(spark):
    out = REGISTRY["attribution_position_based"].spark(spark, SF_DIR).collect()
    assert len(out) > 0
    n_conv = out[0].n_conversions
    assert sum(r.credit_micro for r in out) == 1_000_000 * n_conv
    assert abs(sum(r.credit_share for r in out) - 1.0) < 1e-4
