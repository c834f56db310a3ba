"""Semantic laws for the r4y wave: Holt-Winters seasonal smoothing +
leave-last-out recommender hit rate."""

from __future__ import annotations

import datetime

import duckdb

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR

ALPHA, BETA, GAMMA, M = 0.5, 0.25, 0.5, 7


def _hw_reference(xs):
    out = []
    l = b = 0.0
    s = [0.0] * M
    started = False
    for x in xs:
        if not started:
            l, b, started = x, 0.0, True
            s = [0.0] * M
        else:
            s_old = s[0]
            new_l = ALPHA * (x - s_old) + (1 - ALPHA) * (l + b)
            new_b = BETA * (new_l - l) + (1 - BETA) * b
            new_s = GAMMA * (x - new_l) + (1 - GAMMA) * s_old
            s = s[1:] + [new_s]
            l, b = new_l, new_b
        out.append((l, b, s[-1], l + b + s[0]))
    return out


# --------------------------------------------------------------------------
# ts_holt_winters
# --------------------------------------------------------------------------


def test_holt_winters_matches_python_recursion(spark):
    out = (
        REGISTRY["ts_holt_winters"].spark(spark, SF_DIR).toPandas()
        .sort_values("day")
    )
    ref = _hw_reference([float(c) for c in out.x_cents])
    for row, (l, b, sv, fc) in zip(out.itertuples(), ref):
        assert abs(row.level - l) < 1e-3
        assert abs(row.trend - b) < 1e-3
        assert abs(row.seasonal - sv) < 1e-3
        assert abs(row.forecast_next - fc) < 1e-3


def test_holt_winters_flat_series_degenerate(spark, tmp_path):
    rows = [
        (
            i,
            i % 10,
            "view",
            datetime.datetime(2024, 3, 1 + i, 12, 0, 0),
            50.0,
            "s",
        )
        for i in range(21)
    ]
    spark.createDataFrame(
        rows,
        "event_id BIGINT, user_id BIGINT, event_type STRING, "
        "ts TIMESTAMP, value DOUBLE, session_id STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = REGISTRY["ts_holt_winters"].spark(spark, str(tmp_path)).toPandas()
    # constant series: level locks to the constant, trend and seasonal
    # stay exactly zero, forecast equals the level
    assert (out.level == 5000.0).all()
    assert (out.trend == 0.0).all()
    assert (out.seasonal == 0.0).all()
    assert (out.forecast_next == 5000.0).all()


def test_holt_winters_learns_planted_weekly_pattern(spark, tmp_path):
    # 8 weeks of base 100 + a +400 spike every 7th day: after warmup the
    # seasonal state must carry most of the spike
    rows = []
    day0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    for i in range(56):
        val = 500.0 if i % 7 == 0 else 100.0
        rows.append((i, 1, "view", day0 + datetime.timedelta(days=i), val, "s"))
    spark.createDataFrame(
        rows,
        "event_id BIGINT, user_id BIGINT, event_type STRING, "
        "ts TIMESTAMP, value DOUBLE, session_id STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = (
        REGISTRY["ts_holt_winters"].spark(spark, str(tmp_path)).toPandas()
        .sort_values("day").reset_index(drop=True)
    )
    # seasonal component on the last spike day is strongly positive,
    # on the day after strongly closer to zero
    spike_rows = out.iloc[49::7]
    calm_rows = out.iloc[50::7]
    assert (spike_rows.seasonal > 10000).all()  # cents scale
    assert (calm_rows.seasonal < 2000).all()


# --------------------------------------------------------------------------
# recsys_hit_rate
# --------------------------------------------------------------------------


def test_hit_rate_sf_identities(spark):
    out = REGISTRY["recsys_hit_rate"].spark(spark, SF_DIR).toPandas().iloc[0]
    assert out.n_eval > 0
    assert 0 <= out.hits_at_1 <= out.hits_at_5 <= out.hits_at_10 <= out.n_eval
    assert out.hit_rate_1 <= out.hit_rate_5 <= out.hit_rate_10 <= 1.0
    # MRR@10 is bounded by hit_rate_10 (each hit contributes <= 1) and
    # below by hit_rate_10/10 (each hit contributes >= 1/10)
    assert out.mrr_10 <= out.hit_rate_10 + 1e-9
    assert out.mrr_10 >= out.hit_rate_10 / 10 - 1e-9
    assert out.mrr_10 >= out.hit_rate_1 - 1e-9


def test_hit_rate_planted_recommendation(spark, tmp_path):
    # brands: B1/B2 co-occur for training customers; target customers
    # hold out B2 with profile {B1} -> hit at rank 1
    parts = [(1, "B1"), (2, "B2"), (3, "B4")]
    spark.createDataFrame(parts, "p_partkey BIGINT, p_brand STRING").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/part.parquet")
    orders, lineitem = [], []
    ok = 0
    d1 = datetime.date(2024, 1, 1)
    d2 = datetime.date(2024, 2, 1)
    for cust in range(1, 5):  # targets: first {B1}, last {B2}
        ok += 1
        orders.append((ok, cust, d1))
        lineitem.append((ok, 1))
        ok += 1
        orders.append((ok, cust, d2))
        lineitem.append((ok, 2))
    for cust in range(5, 9):  # trainers: first {B1,B2}, last {B4}
        ok += 1
        orders.append((ok, cust, d1))
        lineitem.append((ok, 1))
        lineitem.append((ok, 2))
        ok += 1
        orders.append((ok, cust, d2))
        lineitem.append((ok, 3))
    spark.createDataFrame(
        orders, "o_orderkey BIGINT, o_custkey BIGINT, o_orderdate DATE"
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        lineitem, "l_orderkey BIGINT, l_partkey BIGINT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    out = REGISTRY["recsys_hit_rate"].spark(spark, str(tmp_path)).toPandas().iloc[0]
    # all 8 customers have nonempty train profiles; the 4 targets hit
    # at rank 1 (B2 is B1's only neighbor), the 4 trainers hold out the
    # unrecommendable B4
    assert out.n_eval == 8
    assert out.hits_at_1 == 4
    assert out.hits_at_10 == 4
    assert abs(out.hit_rate_1 - 0.5) < 1e-9
    assert abs(out.mrr_10 - 0.5) < 1e-9
