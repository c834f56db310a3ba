"""Semantic laws for the r6d wave: DTW distance + daily bounce rate."""

from __future__ import annotations

import datetime

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# --------------------------------------------------------------------------
# ts_dtw_distance
# --------------------------------------------------------------------------


def _dtw(a, b):
    n, m = len(a), len(b)
    inf = float("inf")
    prev = [0.0] + [inf] * m
    for i in range(1, n + 1):
        curr = [inf]
        for j in range(1, m + 1):
            cost = abs(a[i - 1] - b[j - 1])
            curr.append(cost + min(prev[j], curr[j - 1], prev[j - 1]))
        prev = curr
    return prev[m]


def test_dtw_matches_python_dp(spark):
    import duckdb

    rows = duckdb.sql(
        f"""
        SELECT CAST(ts AS DATE) d,
               SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) a,
               SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END) b
        FROM '{SF_DIR}/events.parquet' GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    a = [int(r[1]) for r in rows]
    b = [int(r[2]) for r in rows]
    out = REGISTRY["ts_dtw_distance"].spark(spark, SF_DIR).toPandas().iloc[0]
    assert out.dtw_l1 == _dtw(a, b)
    assert out.lockstep_l1 == sum(abs(x - y) for x, y in zip(a, b))
    assert out.warp_gain == out.lockstep_l1 - out.dtw_l1
    assert out.warp_gain >= 0  # the diagonal is one admissible warping


def test_dtw_rewards_pure_shift(spark, tmp_path):
    # view = click shifted by one day: lockstep pays the full offset
    # every day, DTW realigns and pays only the boundary.
    rows, eid = [], 0
    t0 = datetime.datetime(2024, 1, 1, 12)
    clicks = [10, 50, 10, 50, 10, 50, 10, 50, 10, 50]
    for d, c in enumerate(clicks):
        ts = t0 + datetime.timedelta(days=d)
        for _ in range(c):
            rows.append((eid, ts, 1, "click", 1.0, "{}")); eid += 1
        shifted = clicks[d - 1] if d > 0 else clicks[0]
        for _ in range(shifted):
            rows.append((eid, ts, 1, "view", 1.0, "{}")); eid += 1
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = (
        REGISTRY["ts_dtw_distance"].spark(spark, str(tmp_path))
        .toPandas().iloc[0]
    )
    # lockstep pays |c_d - c_{d-1}| = 40 on each of days 1..9 -> 360;
    # DTW realigns the shift and pays only the unmatched tail (40)
    assert out.lockstep_l1 == 360
    assert out.dtw_l1 == 40
    assert out.warp_gain == 320


# --------------------------------------------------------------------------
# ts_bounce_rate
# --------------------------------------------------------------------------


def test_bounce_rate_hand_scenario(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1, 10)

    def ts(mins):
        return t0 + datetime.timedelta(minutes=mins)

    rows = [
        # user 1: 3 events within 30-min gaps = ONE session (no bounce)
        (1, ts(0), 1, "click", 0.0, "{}"),
        (2, ts(20), 1, "view", 0.0, "{}"),
        (3, ts(40), 1, "view", 0.0, "{}"),
        # user 1 again 2 hours later: single event = bounce
        (4, ts(180), 1, "click", 0.0, "{}"),
        # user 2: one event = bounce
        (5, ts(5), 2, "view", 0.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = REGISTRY["ts_bounce_rate"].spark(spark, str(tmp_path)).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r.n_sessions == 3
    assert r.n_bounces == 2
    assert r.bounce_ppm == 2 * 1_000_000 // 3


def test_bounce_rate_real_data_invariants(spark):
    out = REGISTRY["ts_bounce_rate"].spark(spark, SF_DIR).toPandas()
    assert len(out) > 0
    assert (out.n_bounces <= out.n_sessions).all()
    assert (out.bounce_ppm <= 1_000_000).all()
    assert (
        out.bounce_ppm == out.n_bounces * 1_000_000 // out.n_sessions
    ).all()
