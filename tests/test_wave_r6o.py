"""Semantic laws for the r6o wave: documented scale/robust swaps
delivered — binned weighted median, bin-offset Gini, Siegel repeated
median — plus the multimodal oracle upgrades' operator laws."""

from __future__ import annotations

import datetime
import zlib

import numpy as np
import pandas as pd

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _frames_equal(a, b):
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True),
        check_dtype=False,
    )


def test_weighted_median_binned_equals_direct(spark):
    """Two different algorithms, one frame: the two-pass binned form
    must reproduce the single-window form row-for-row."""
    a = (
        REGISTRY["agg_weighted_median"].spark(spark, SF_DIR)
        .toPandas().sort_values("l_returnflag")
    )
    b = (
        REGISTRY["agg_weighted_median_binned"].spark(spark, SF_DIR)
        .toPandas().sort_values("l_returnflag")
    )
    _frames_equal(a, b)


def test_gini_binned_equals_direct(spark):
    a = (
        REGISTRY["agg_gini"].spark(spark, SF_DIR)
        .toPandas().sort_values("regionkey")
    )
    b = (
        REGISTRY["agg_gini_binned"].spark(spark, SF_DIR)
        .toPandas().sort_values("regionkey")
    )
    _frames_equal(a, b)


# ---------------------------------------------------------------------------
# ts_siegel_repeated_median
# ---------------------------------------------------------------------------

def _write_daily_values(spark, tmp_path, day_values):
    rows = [
        (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d),
         i, "click", float(v), "{}")
        for i, (d, v) in enumerate(day_values)
    ]
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")


def _siegel_python(days, cents):
    meds = []
    for i, (di, ci) in enumerate(zip(days, cents)):
        sl = [
            (cj - ci) / (dj - di)
            for j, (dj, cj) in enumerate(zip(days, cents))
            if j != i
        ]
        meds.append(np.percentile(sl, 50, method="linear"))
    return np.percentile(meds, 50, method="linear") / 100.0


def test_siegel_survives_40pct_corruption(spark, tmp_path):
    """A contiguous 8-day tail shifted by +1e4 (a level-shift outage,
    the classic backfill artifact): all 96 clean-corrupt pair slopes
    are positive-huge, pushing Theil-Sen's single median (rank 95/190
    straddles the clean/contaminated boundary) onto the artifact; the
    repeated median stays exactly on the true slope because the 12
    clean anchors each keep a clean majority among their partners and
    themselves form the outer majority."""
    true_slope = 0.1  # value units per day
    day_values = []
    for d in range(20):
        v = true_slope * d
        if d >= 12:  # contiguous corrupted tail, 8 of 20 days
            v += 10000.0
        day_values.append((d, v))
    _write_daily_values(spark, tmp_path, day_values)
    sg = (
        REGISTRY["ts_siegel_repeated_median"].spark(spark, str(tmp_path))
        .toPandas().set_index("event_type")
    )
    ts = (
        REGISTRY["ts_theilsen"].spark(spark, str(tmp_path))
        .toPandas().set_index("event_type")
    )
    days = [d for d, _ in day_values]
    cents = [round(v * 100) for _, v in day_values]
    exp = _siegel_python(days, cents)
    got = sg.loc["click", "siegel_slope"]
    assert abs(got - np.floor(exp * 1e4 + 0.5) / 1e4) < 1e-9
    assert abs(got - true_slope) < 0.05
    assert abs(ts.loc["click", "theilsen_slope"] - true_slope) > 10 * abs(
        got - true_slope
    )


def test_siegel_matches_python_on_fixture(spark):
    import duckdb

    daily = duckdb.sql(
        f"""SELECT event_type,
                   epoch_us(ts) // 86400000000 AS day,
                   SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS cents
            FROM '{SF_DIR}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    by_type: dict[str, list] = {}
    for t, d, c in daily:
        by_type.setdefault(t, []).append((d, c))
    out = (
        REGISTRY["ts_siegel_repeated_median"].spark(spark, SF_DIR)
        .toPandas().set_index("event_type")
    )
    for t, seq in by_type.items():
        days = [d for d, _ in seq]
        cents = [c for _, c in seq]
        exp = _siegel_python(days, cents)
        assert out.loc[t, "n_days"] == len(seq)
        assert abs(
            out.loc[t, "siegel_slope"] - np.floor(exp * 1e4 + 0.5) / 1e4
        ) < 1e-9


# ---------------------------------------------------------------------------
# multimodal oracle-upgrade operator laws
# ---------------------------------------------------------------------------

def test_features_checksum_is_adler32(spark):
    out = (
        REGISTRY["multimodal_features"].spark(spark, SF_DIR)
        .toPandas().set_index("doc_id")
    )
    import duckdb

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    for did, text in docs:
        raw = text.encode()
        assert out.loc[did, "checksum"] == zlib.adler32(raw)
        assert out.loc[did, "n_bytes"] == len(raw)
        fs = [out.loc[did, f"f{i}"] for i in range(4)]
        assert abs(sum(fs) - 1.0) < 5e-6  # shares partition the bytes
