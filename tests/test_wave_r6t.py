"""Semantic laws for the r6t wave: delta-method ratio SEs and the
sequential probability ratio test."""

from __future__ import annotations

import datetime
import hashlib
import math

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")


# ---------------------------------------------------------------------------
# ab_delta_method
# ---------------------------------------------------------------------------

def _delta_python(users):
    """users: list of (x, y) for one arm."""
    n = len(users)
    sx = sum(x for x, _ in users)
    sy = sum(y for _, y in users)
    sxx = sum(x * x for x, _ in users)
    syy = sum(y * y for _, y in users)
    sxy = sum(x * y for x, y in users)
    r = sx / sy
    yb = sy / n
    vx = (n * sxx - sx * sx) / (n * (n - 1))
    vy = (n * syy - sy * sy) / (n * (n - 1))
    cxy = (n * sxy - sx * sy) / (n * (n - 1))
    se = math.sqrt(max(vx - 2 * r * cxy + r * r * vy, 0.0) / n) / yb
    naive = math.sqrt(r * (1 - r) / sy)
    return n, sx, sy, r, se, naive


def test_delta_method_matches_python(spark):
    import duckdb

    rows = duckdb.sql(
        f"""SELECT user_id,
                   SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END),
                   COUNT(*)
            FROM '{SF_DIR}/events.parquet' GROUP BY 1"""
    ).fetchall()
    arms: dict[str, list] = {"A": [], "B": []}
    for uid, x, y in rows:
        arm = "A" if hashlib.md5(
            f"arm:{uid}".encode()
        ).hexdigest()[0] < "8" else "B"
        arms[arm].append((x, y))
    out = (
        REGISTRY["ab_delta_method"].spark(spark, SF_DIR)
        .toPandas().set_index("arm")
    )
    for arm, users in arms.items():
        n, sx, sy, r, se, naive = _delta_python(users)
        row = out.loc[arm]
        assert (row.n_users, row.sum_conversions, row.sum_events) == (
            n, sx, sy,
        )
        assert abs(row.ratio - math.floor(r * 1e6 + 0.5) / 1e6) < 1e-12
        assert abs(row.se_delta - math.floor(se * 1e6 + 0.5) / 1e6) < 1e-12
        assert abs(row.se_naive
                   - math.floor(naive * 1e6 + 0.5) / 1e6) < 1e-12


def test_delta_method_flags_clustered_traffic(spark, tmp_path):
    """Heavy users with many events and proportional conversions:
    the user-clustered delta SE exceeds the row-binomial naive SE —
    exactly the underestimation the method exists to correct."""
    d0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid in range(40):
        # all-or-nothing users: half convert on EVERY event, half never
        # -> per-user ratios are 0/1, the maximal within-user clustering
        vol = 2 + (uid % 10) * 4
        for i in range(vol):
            et = "purchase" if uid % 2 == 0 else "view"
            rows.append((eid, d0, uid, et, 1.0, "{}"))
            eid += 1
    _write_events(spark, tmp_path, rows)
    out = REGISTRY["ab_delta_method"].spark(spark, str(tmp_path)).toPandas()
    for _, r in out.iterrows():
        assert r.se_delta > 0
        assert r.se_delta > r.se_naive  # clustering inflates true SE


# ---------------------------------------------------------------------------
# ab_sequential_sprt
# ---------------------------------------------------------------------------

def _sprt_python(daily):
    """daily: ordered list of (day, n_day, c_day). Returns trajectory
    and the first decision day."""
    p0, p1, al, be = 0.18, 0.22, 0.05, 0.20
    up = math.log((1 - be) / al)
    lo = math.log(be / (1 - al))
    lr1 = math.log(p1 / p0)
    lr0 = math.log((1 - p1) / (1 - p0))
    n = c = 0
    traj = []
    decision = None
    for day, nd, cd in daily:
        n += nd
        c += cd
        llr = c * lr1 + (n - c) * lr0
        state = (
            "accept_h1" if llr >= up
            else "accept_h0" if llr <= lo
            else "continue"
        )
        if state != "continue" and decision is None:
            decision = day
        traj.append((day, n, c, llr, state))
    return traj, decision


def test_sprt_matches_python(spark):
    import duckdb

    daily = duckdb.sql(
        f"""SELECT CAST(ts AS DATE), COUNT(DISTINCT user_id),
                   COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                       THEN user_id END)
            FROM '{SF_DIR}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    traj, decision = _sprt_python(daily)
    out = (
        REGISTRY["ab_sequential_sprt"].spark(spark, SF_DIR)
        .toPandas().set_index("day")
    )
    assert len(out) == len(traj)
    for day, n, c, llr, state in traj:
        r = out.loc[day]
        assert (r.n_users, r.n_conversions) == (n, c)
        assert abs(r.llr - math.floor(llr * 1e4 + 0.5) / 1e4) < 1e-12
        assert r.state == state
        assert r.is_decision_point == int(day == decision)
    assert out.is_decision_point.sum() == (0 if decision is None else 1)


def test_sprt_exact_null_rate_accepts_h0(spark, tmp_path):
    """Data generated at exactly p0 = 0.18: the LLR drifts down and
    crosses the H0 boundary — the sequential test SAVES samples by
    stopping a flat experiment."""
    d0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    uid = 0
    for day in range(12):
        for k in range(50):  # 50 fresh users/day, exactly 9 convert
            et = "purchase" if k < 9 else "view"
            rows.append((eid, d0 + datetime.timedelta(days=day), uid,
                         et, 1.0, "{}"))
            eid += 1
            uid += 1
    _write_events(spark, tmp_path, rows)
    out = REGISTRY["ab_sequential_sprt"].spark(spark, str(tmp_path)).toPandas()
    assert out.is_decision_point.sum() == 1
    dec = out[out.is_decision_point == 1].iloc[0]
    assert dec.state == "accept_h0"
    # python cross-check of the decision day
    daily = [(d0.date() + datetime.timedelta(days=d), 50, 9)
             for d in range(12)]
    _, decision = _sprt_python(daily)
    assert dec.day == decision
