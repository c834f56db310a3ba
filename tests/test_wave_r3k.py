"""Semantic laws for the r3k wave: CPM critical path and the
histogram-drift gate."""

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


# ------------------------------------------------------------------- cpm

def test_cpm_hand_computed_schedule(spark):
    out = {r.task: r for r in
           REGISTRY["ops_dag_critical_path"].spark(spark, SF_DIR).collect()}
    assert len(out) == 9
    expect = {
        # task: (es, ef, slack, critical)
        "file_sensor": (0, 5, 0, True),
        "gcs_to_raw": (5, 20, 0, True),
        "raw_to_staging": (20, 40, 0, True),
        "trigger_dataflow": (20, 45, 5, False),
        "qc_gates": (40, 50, 0, True),
        "dbt_run": (50, 70, 5, False),
        "staging_to_curation": (50, 75, 0, True),
        "scd2_merge": (75, 90, 0, True),
        "archive": (90, 95, 0, True),
    }
    for task, (es, ef, slack, crit) in expect.items():
        r = out[task]
        assert (r.es, r.ef, r.slack, r.is_critical) == (es, ef, slack, crit), task


def test_cpm_critical_path_durations_sum_to_makespan(spark):
    out = REGISTRY["ops_dag_critical_path"].spark(spark, SF_DIR).collect()
    makespan = max(r.ef for r in out)
    crit_sum = sum(r.dur_min for r in out if r.is_critical)
    assert crit_sum == makespan  # a single serial chain is critical here
    for r in out:
        assert r.slack >= 0
        assert r.is_critical == (r.slack == 0)


# ----------------------------------------------------------------- drift

def test_drift_identical_halves_zero_tv(spark, tmp_path):
    rows = [(i * 100 + d, _day(d), 1, "click", float(10 + (i % 5) * 60), "{}")
            for d in range(30) for i in range(6)]
    _write_events(spark, tmp_path, rows)
    out = REGISTRY["qc_histogram_drift"].spark(spark, str(tmp_path)).collect()
    for r in out:
        assert r.tv_distance == 0.0 and not r.is_drifted
        assert r.share_first == r.share_second


def test_drift_disjoint_halves_tv_one(spark, tmp_path):
    rows = [(d * 10 + i, _day(d), 1, "click",
             10.0 if d < 15 else 420.0, "{}")
            for d in range(30) for i in range(4)]
    _write_events(spark, tmp_path, rows)
    out = {r.bucket: r for r in
           REGISTRY["qc_histogram_drift"].spark(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 8}
    assert out[0].n_second == 0 and out[8].n_first == 0
    for r in out.values():
        assert r.tv_distance == 1.0 and r.is_drifted


def test_drift_fixture_shares_conserve(spark):
    out = REGISTRY["qc_histogram_drift"].spark(spark, SF_DIR).collect()
    assert abs(sum(r.share_first for r in out) - 1.0) <= 1e-4
    assert abs(sum(r.share_second for r in out) - 1.0) <= 1e-4
    tvs = {r.tv_distance for r in out}
    assert len(tvs) == 1 and 0.0 <= tvs.pop() <= 1.0
