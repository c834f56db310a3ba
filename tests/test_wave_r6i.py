"""Semantic laws for the r6i wave: cron-spec expansion + pseudonym
rotation."""

from __future__ import annotations

import datetime
import hashlib

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# --------------------------------------------------------------------------
# ops_cron_schedule
# --------------------------------------------------------------------------


def test_cron_fires_match_python(spark):
    import duckdb

    t0, t1 = duckdb.sql(
        f"""SELECT date_trunc('minute', MIN(ts)),
                   date_trunc('minute', MAX(ts))
            FROM '{SF_DIR}/events.parquet'"""
    ).fetchone()
    specs = {
        "daily_0300": (0, 3, -1, -1),
        "hourly_15": (15, -1, -1, -1),
        "monday_0900": (0, 9, -1, 1),
        "month_first_0000": (0, 0, 1, -1),
    }
    expect = {k: [] for k in specs}
    cur = t0
    while cur <= t1:
        for name, (mi, h, dom, dow) in specs.items():
            if (
                (mi == -1 or cur.minute == mi)
                and (h == -1 or cur.hour == h)
                and (dom == -1 or cur.day == dom)
                and (dow == -1 or cur.isoweekday() == dow)
            ):
                expect[name].append(cur)
        cur += datetime.timedelta(minutes=1)
    out = (
        REGISTRY["ops_cron_schedule"].spark(spark, SF_DIR).toPandas()
        .set_index("name")
    )
    assert set(out.index) == set(specs)
    for name, fires in expect.items():
        assert out.loc[name, "n_fires"] == len(fires)
        if fires:
            assert out.loc[name, "first_fire"] == fires[0]
            assert out.loc[name, "last_fire"] == fires[-1]
            if len(fires) > 1:
                gap = (fires[-1] - fires[0]).total_seconds() // 60
                assert (
                    out.loc[name, "mean_gap_minutes"]
                    == gap // (len(fires) - 1)
                )


def test_cron_hourly_dominates_daily(spark):
    out = (
        REGISTRY["ops_cron_schedule"].spark(spark, SF_DIR).toPandas()
        .set_index("name")
    )
    assert (
        out.loc["hourly_15", "n_fires"] > out.loc["daily_0300", "n_fires"]
    )
    assert out.loc["monday_0900", "n_fires"] <= 5  # <= Mondays in 30d
    # hourly spec's mean gap is exactly 60 minutes
    assert out.loc["hourly_15", "mean_gap_minutes"] == 60


# --------------------------------------------------------------------------
# privacy_pseudonym_rotation
# --------------------------------------------------------------------------


def test_rotation_audit_on_real_data(spark):
    out = (
        REGISTRY["privacy_pseudonym_rotation"].spark(spark, SF_DIR)
        .toPandas().iloc[0]
    )
    assert bool(out.rotation_ok)
    assert out.n_value_links == 0
    assert out.n_stable == 0
    # 64-bit pseudonyms over a small key set: collision-free
    assert out.epoch1_collisions == 0
    assert out.epoch2_collisions == 0
    assert out.n_keys > 0


def test_rotation_audit_python_recompute(spark):
    import duckdb

    keys = [
        k for (k,) in duckdb.sql(
            f"SELECT DISTINCT c_custkey FROM '{SF_DIR}/customer.parquet'"
        ).fetchall()
    ]
    p1 = {hashlib.md5(f"epoch1:{k}".encode()).hexdigest()[:16]
          for k in keys}
    p2 = {hashlib.md5(f"epoch2:{k}".encode()).hexdigest()[:16]
          for k in keys}
    out = (
        REGISTRY["privacy_pseudonym_rotation"].spark(spark, SF_DIR)
        .toPandas().iloc[0]
    )
    assert out.n_keys == len(keys)
    assert out.epoch1_collisions == len(keys) - len(p1)
    assert out.n_value_links == sum(1 for v in p1 if v in p2)
