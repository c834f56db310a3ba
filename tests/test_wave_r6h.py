"""Semantic laws for the r6h wave: the matrix profile."""

from __future__ import annotations

import datetime

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _write_events(spark, tmp_path, daily_counts):
    """One event row per count unit on consecutive days, single type."""
    rows = []
    eid = 0
    d0 = datetime.datetime(2024, 1, 1)
    for di, c in enumerate(daily_counts):
        for _ in range(c):
            rows.append(
                (eid, d0 + datetime.timedelta(days=di), eid, "click",
                 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")


def test_matrix_profile_planted_motif_and_discord(spark, tmp_path):
    """Two identical planted weeks find each other at distance 0; the
    discord week (a spike pattern appearing once) has the maximal
    profile value."""
    base = [5, 6, 5, 7, 6, 5, 6]
    motif = [20, 1, 20, 1, 20, 1, 20]
    discord = [90, 90, 90, 90, 90, 90, 90]
    # layout: motif at days 0-6, base x2 at 7-20, discord at 21-27,
    # motif again at 28-34
    series = motif + base + base + discord + motif
    _write_events(spark, tmp_path, series)
    out = (
        REGISTRY["ts_matrix_profile"].spark(spark, str(tmp_path))
        .toPandas().set_index("idx")
    )
    # windows are 1-indexed: window 1 = days 0-6 (motif), window 29 =
    # days 28-34 (the copy)
    assert out.loc[1, "mp_dist"] == 0 and out.loc[1, "nn_idx"] == 29
    assert out.loc[29, "mp_dist"] == 0 and out.loc[29, "nn_idx"] == 1
    # the discord window (exactly days 21-27 -> index 22) maximizes MP
    assert out.mp_dist.idxmax() == 22


def test_matrix_profile_fixture_invariants(spark):
    """Exclusion zone honored, distances non-negative, every complete
    window present exactly once per type."""
    out = REGISTRY["ts_matrix_profile"].spark(spark, SF_DIR).toPandas()
    assert (out.mp_dist >= 0).all()
    assert ((out.nn_idx - out.idx).abs() >= 7).all()
    per_type = out.groupby("event_type")["idx"].agg(["count", "min", "max"])
    for _, r in per_type.iterrows():
        assert r["count"] == r["max"] - r["min"] + 1  # contiguous windows


def test_stomp_equals_direct_form(spark):
    """The STOMP recurrence must reproduce the direct pair computation
    frame-for-frame (same oracle, same rows)."""
    import pandas as pd

    a = (
        REGISTRY["ts_matrix_profile"].spark(spark, SF_DIR).toPandas()
        .sort_values(["event_type", "idx"]).reset_index(drop=True)
    )
    b = (
        REGISTRY["ts_matrix_profile_stomp"].spark(spark, SF_DIR)
        .toPandas().sort_values(["event_type", "idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
