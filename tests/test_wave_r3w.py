"""Semantic laws for the r3w wave: interval-overlap join and mergeable
moments."""

from __future__ import annotations

import datetime as dt

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _ts(sec: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


# -------------------------------------------------------- interval join

def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")


def test_interval_overlap_constructed(spark, tmp_path):
    rows = []
    # 5 errors inside hour 0 -> incident window [0, 3600)
    for i in range(5):
        rows.append((i + 1, _ts(60 * i), 99, "error", 1.0, "{}"))
    rows += [
        # fully inside the incident: 300 s of overlap
        (10, _ts(100), 1, "view", 1.0, "{}"),
        # straddles the hour boundary (bucket-explode case): 60 s
        (11, _ts(3540), 1, "view", 1.0, "{}"),
        # outside entirely
        (12, _ts(7000), 1, "view", 1.0, "{}"),
        # zero-length touch at the boundary must NOT count
        (13, _ts(3600), 2, "view", 1.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    out = {r.user_id: r for r in
           REGISTRY["join_interval_overlap"].spark(spark, str(tmp_path))
           .collect()}
    assert set(out) == {1}
    assert (out[1].n_overlaps, out[1].overlap_us) == (2, 360 * 1_000_000)


def test_interval_overlap_no_incidents(spark, tmp_path):
    # 4 errors only: below the burst threshold -> no incident windows
    rows = [(i + 1, _ts(60 * i), 99, "error", 1.0, "{}") for i in range(4)]
    rows.append((10, _ts(100), 1, "view", 1.0, "{}"))
    _write_events(spark, tmp_path, rows)
    out = REGISTRY["join_interval_overlap"].spark(spark, str(tmp_path)).collect()
    assert out == []


def test_interval_overlap_fixture_laws(spark):
    out = REGISTRY["join_interval_overlap"].spark(spark, SF_DIR).collect()
    for r in out:
        assert r.n_overlaps >= 1
        assert 0 < r.overlap_us <= r.n_overlaps * 300_000_000


# ------------------------------------------------------------- moments

def _write_customers(spark, tmp_path, shard_balances):
    rows, ck = [], 0
    for shard, bals in shard_balances.items():
        for b in bals:
            ck += 1
            rows.append((ck, f"c{ck}", shard, float(b), "BUILDING"))
    spark.createDataFrame(
        rows,
        "c_custkey BIGINT, c_name STRING, c_nationkey INT, "
        "c_acctbal DOUBLE, c_mktsegment STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")


def test_moments_merge_known_values(spark, tmp_path):
    bals = {0: [0.01, 0.02, 0.03], 1: [0.10, 0.20]}
    _write_customers(spark, tmp_path, bals)
    vals = [1, 2, 3, 10, 20]  # cents
    n = len(vals)
    mean = sum(vals) / n
    pvar = sum((v - mean) ** 2 for v in vals) / n
    r = REGISTRY["stats_moments_merge"].spark(spark, str(tmp_path)).collect()[0]
    assert (r.n_total, r.n_shards) == (5, 2)
    assert abs(r.mean_merged - mean) < 1e-6
    assert abs(r.var_merged - pvar) < 1e-3
    assert r.var_merged == r.var_direct  # both 4-dp rounded, drift ~ 0
    assert r.abs_drift < 1e-5


def test_moments_merge_single_shard_identity(spark, tmp_path):
    _write_customers(spark, tmp_path, {3: [1.00, 2.00, 3.00, 4.00]})
    r = REGISTRY["stats_moments_merge"].spark(spark, str(tmp_path)).collect()[0]
    assert (r.n_total, r.n_shards) == (4, 1)
    assert r.var_merged == r.var_direct and r.abs_drift == 0.0


def test_moments_merge_fixture_law(spark):
    r = REGISTRY["stats_moments_merge"].spark(spark, SF_DIR).collect()[0]
    assert r.n_shards == 25
    assert r.var_merged == r.var_direct  # the merge law, 4-dp
    assert r.abs_drift < 1e-3
