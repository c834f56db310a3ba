"""Semantic laws for the r6a wave: seasonality strength + dyadic decay
weighting."""

from __future__ import annotations

import datetime

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# --------------------------------------------------------------------------
# ts_seasonality_strength
# --------------------------------------------------------------------------


def _events(spark, path, rows):
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_strength_bounds_on_real_data(spark):
    out = REGISTRY["ts_seasonality_strength"].spark(spark, SF_DIR).toPandas()
    r = out.iloc[0]
    assert 0.0 <= r.f_seasonal <= 1.0
    assert 0.0 <= r.f_trend <= 1.0
    assert r.n_days > 20


def test_strength_pure_weekly_signal(spark, tmp_path):
    # value depends ONLY on weekday (big amplitude), 8 weeks of days:
    # the seasonal strength must saturate and dominate.
    rows = []
    t0 = datetime.datetime(2024, 1, 1)
    for d in range(56):
        ts = t0 + datetime.timedelta(days=d)
        rows.append((d, ts, 1, "click", 100.0 * (d % 7 + 1), "{}"))
    _events(spark, tmp_path, rows)
    out = (
        REGISTRY["ts_seasonality_strength"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .iloc[0]
    )
    assert out.f_seasonal > 0.99
    assert out.f_seasonal > out.f_trend
    assert bool(out.seasonal_dominant)


def test_strength_pure_trend_signal(spark, tmp_path):
    # a clean linear ramp: trend strength saturates, seasonal doesn't
    rows = []
    t0 = datetime.datetime(2024, 1, 1)
    for d in range(56):
        ts = t0 + datetime.timedelta(days=d)
        rows.append((d, ts, 1, "click", 100.0 + 50.0 * d, "{}"))
    _events(spark, tmp_path, rows)
    out = (
        REGISTRY["ts_seasonality_strength"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .iloc[0]
    )
    assert out.f_trend > 0.99
    assert out.f_trend > out.f_seasonal
    assert not bool(out.seasonal_dominant)


# --------------------------------------------------------------------------
# agg_decay_weighted
# --------------------------------------------------------------------------


def test_decay_matches_python_recompute(spark):
    import duckdb

    out = (
        REGISTRY["agg_decay_weighted"].spark(spark, SF_DIR).toPandas()
        .set_index("nation")
    )
    rows = duckdb.sql(
        f"""
        SELECT n.n_name,
               datediff('day', CAST(o.o_orderdate AS DATE),
                   (SELECT MAX(CAST(o_orderdate AS DATE))
                    FROM '{SF_DIR}/orders.parquet')) // 7 AS k,
               SUM(CAST(FLOOR(o.o_totalprice*100.0+0.5) AS BIGINT)) sub
        FROM '{SF_DIR}/orders.parquet' o
        JOIN '{SF_DIR}/customer.parquet' c ON o.o_custkey = c.c_custkey
        JOIN '{SF_DIR}/nation.parquet' n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2
        """
    ).fetchall()
    per = {}
    for name, k, sub in rows:
        tot, dec = per.get(name, (0, 0))
        term = 0 if k >= 57 else (int(sub) * 100) // (1 << int(k))
        per[name] = (tot + int(sub), dec + term)
    for name, (tot, dec) in per.items():
        assert out.loc[name, "total_cents"] == tot
        assert out.loc[name, "decayed_cents"] == dec / 100.0
    # decay strictly reduces mass (and the 1e-6-quantized share can
    # floor to exactly 0 for a nation whose recent sales are tiny)
    assert (out.decayed_cents < out.total_cents).all()
    assert (out.recency_share >= 0).all()
    assert (out.recency_share > 0).any()


def test_decay_known_halving(spark, tmp_path):
    rows = [
        # k=0 (at max date): weight 1; k=1 (7 days earlier): weight 1/2
        (1, 10, "O", 100.0, datetime.datetime(2024, 1, 8), "1-A"),
        (2, 10, "O", 100.0, datetime.datetime(2024, 1, 1), "1-A"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, "
        "o_orderpriority STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [(10, 0)], "c_custkey BIGINT, c_nationkey BIGINT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(
        [(0, "A")], "n_nationkey BIGINT, n_name STRING"
    ).write.mode("overwrite").parquet(f"{tmp_path}/nation.parquet")
    out = (
        REGISTRY["agg_decay_weighted"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .iloc[0]
    )
    assert out.total_cents == 20000
    assert out.decayed_cents == 15000.0  # 10000 + 10000/2 cents
    assert out.recency_share == 0.75
