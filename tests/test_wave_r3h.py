"""Semantic laws for the r3h wave: Holt smoothing and the backfill
planner."""

from __future__ import annotations

import datetime as dt

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _day(i: int, h: int = 12) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=i, hours=h)


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")


# ---------------------------------------------------------------- ts_holt

def test_holt_constant_series_flat(spark, tmp_path):
    _write_events(
        spark, tmp_path,
        [(i, _day(i), 1, "click", 50.0, "{}") for i in range(6)],
    )
    out = REGISTRY["ts_holt"].spark(spark, str(tmp_path)).collect()
    assert len(out) == 6
    for r in out:
        assert r.x_cents == 5000
        assert r.level == 5000.0 and r.trend == 0.0
        assert r.forecast_next == 5000.0


def test_holt_hand_computed_recursion(spark, tmp_path):
    # daily sums 10.00, 12.00, 15.00 -> cents 1000, 1200, 1500
    _write_events(
        spark, tmp_path,
        [(1, _day(0), 1, "click", 10.0, "{}"),
         (2, _day(1), 1, "click", 12.0, "{}"),
         (3, _day(2), 1, "click", 15.0, "{}")],
    )
    out = REGISTRY["ts_holt"].spark(spark, str(tmp_path)).collect()
    # l1=1000 b1=0; l2=.5*1200+.5*1000=1100, b2=.25*100=25;
    # l3=.5*1500+.5*1125=1312.5, b3=.25*212.5+.75*25=71.875
    assert [(r.level, r.trend) for r in out] == [
        (1000.0, 0.0), (1100.0, 25.0), (1312.5, 71.875)
    ]
    assert out[2].forecast_next == 1384.375


def test_holt_fixture_shape(spark):
    out = REGISTRY["ts_holt"].spark(spark, SF_DIR).collect()
    assert len(out) == 30  # one row per fixture day
    days = [r.day for r in out]
    assert days == sorted(days)
    # day 1 state is (x, 0) by construction
    assert out[0].level == float(out[0].x_cents) and out[0].trend == 0.0


# ------------------------------------------------------------- backfill

def test_backfill_fixture_two_ranges(spark):
    out = REGISTRY["ops_backfill_plan"].spark(spark, SF_DIR).collect()
    assert len(out) == 2
    outage, tail = out
    d0 = dt.date(2024, 1, 1)
    assert outage.range_start == d0 + dt.timedelta(days=9)
    assert outage.range_end == d0 + dt.timedelta(days=11)
    assert outage.n_days == 3
    assert tail.range_start == dt.date(2024, 1, 29)
    assert tail.range_end == dt.date(2024, 1, 30)
    assert tail.n_days == 2


def test_backfill_source_hole_also_planned(spark, tmp_path):
    # 15 source days 0..14 with day 5 absent from the feed itself:
    # expect ranges {5}, {9..11}, {13..14}
    rows = [
        (i, _day(i), 1, "click", 1.0, "{}")
        for i in range(15) if i != 5
    ]
    _write_events(spark, tmp_path, rows)
    out = REGISTRY["ops_backfill_plan"].spark(spark, str(tmp_path)).collect()
    got = [(r.range_start.day, r.range_end.day, r.n_days) for r in out]
    assert got == [(6, 6, 1), (10, 12, 3), (14, 15, 2)]
