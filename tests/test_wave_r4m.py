"""Semantic laws for the r4m wave: bucketed spatial join + CUPED."""

from __future__ import annotations

import datetime as dt

import duckdb

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from gcp_de_data_pipeline_cc_spark.plans.relational_ext8 import _GEO_ZONES
from tests.conftest import SF_DIR


def test_spatial_join_matches_bruteforce(spark):
    """The cell-bucketed equi-join must produce EXACTLY the rectangle
    containment a brute-force scan produces — bucketing is a pruning
    strategy, never a semantics change."""
    out = REGISTRY["geo_spatial_join"].spark(spark, SF_DIR).toPandas()
    con = duckdb.connect()
    pts = con.execute(
        f"""
        SELECT -6000 + (c_custkey * 7919 % 12000) AS lat_c,
               -18000 + (c_custkey * 104729 % 36000) AS lon_c
        FROM '{SF_DIR}/customer.parquet'
        """
    ).df()
    for zone, a, b, c, d in _GEO_ZONES:
        want = int(
            (
                (pts["lat_c"] >= a)
                & (pts["lat_c"] < b)
                & (pts["lon_c"] >= c)
                & (pts["lon_c"] < d)
            ).sum()
        )
        got = int(out.loc[out["zone"] == zone, "n_customers"].iloc[0])
        assert got == want, (zone, got, want)


def test_spatial_join_zone_rows_always_present(spark, tmp_path):
    # a customer table whose points all sit at one spot: every zone row
    # still appears, zero-filled where empty
    spark.createDataFrame(
        [(1, "c", 1, 10.0, "B")],
        "c_custkey BIGINT, c_name STRING, c_nationkey BIGINT, "
        "c_acctbal DOUBLE, c_mktsegment STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    out = REGISTRY["geo_spatial_join"].spark(spark, str(tmp_path)).toPandas()
    assert len(out) == len(_GEO_ZONES)
    assert (out["n_customers"] >= 0).all()
    assert out["n_customers"].sum() >= 1  # the point lands somewhere


def test_cuped_reduces_variance_preserving_the_null(spark):
    out = (
        REGISTRY["ab_cuped"]
        .spark(spark, SF_DIR)
        .toPandas()
        .sort_values("arm")
        .reset_index(drop=True)
    )
    assert list(out["arm"]) == ["A", "B"]
    # the POOLED variance reduction is CUPED's guarantee (it equals
    # corr(x,y)^2 >= 0 for the regression theta); per-arm variances can
    # wobble either way at the 15-user fixture scale
    assert 0.0 <= out["var_reduction"].iloc[0] < 1.0
    # experiment-level scalars are constant across arm rows
    for col in ("theta", "var_reduction", "lift_raw", "lift_cuped"):
        assert out[col].nunique() == 1, col


def test_cuped_planted_covariate_shift(spark, tmp_path):
    """Users with a high pre-period level keep it in the experiment
    window (strong covariate): CUPED should remove nearly all
    between-user variance."""
    rows = []
    eid = 0
    for u in range(200):
        level = 100.0 if u % 2 == 0 else 10.0
        for day in (3, 20):  # one pre event, one post event, same level
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 1, day, 9), u, "buy", level, "{}")
            )
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = REGISTRY["ab_cuped"].spark(spark, str(tmp_path)).toPandas()
    # y == x exactly -> theta == 1, residual variance ~ 0
    assert abs(out["theta"].iloc[0] - 1.0) < 1e-6
    assert out["var_reduction"].iloc[0] > 0.999
    assert (out["var_y_adj"] <= 0.01).all()
