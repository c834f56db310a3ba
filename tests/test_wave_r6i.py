"""Semantic laws for the r6i wave: Monte-Carlo schedule risk."""

from __future__ import annotations

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from gcp_de_data_pipeline_cc_spark.plans.ops import _MC_REPS, _TASKS
from tests.conftest import SF_DIR


def test_schedule_mc_quantiles_and_criticality(spark):
    out = (
        REGISTRY["ops_schedule_monte_carlo"].spark(spark, SF_DIR)
        .toPandas().set_index("task")
    )
    assert len(out) == len(_TASKS)
    # quantiles ordered; bounded by the jitter envelope around the
    # deterministic critical path (75 min) and the serial sum
    cpm = REGISTRY["ops_dag_critical_path"].spark(spark, SF_DIR).toPandas()
    cp = cpm.ef.max()
    serial = sum(d for _, d in _TASKS)
    r = out.iloc[0]
    assert r.p50_makespan_min <= r.p90_makespan_min <= r.worst_makespan_min
    assert cp * 0.8 - 1e-9 <= r.p50_makespan_min
    assert r.worst_makespan_min <= serial * 1.2 + 1e-9
    # the single source and single sink are on EVERY critical path
    assert out.loc["file_sensor", "crit_n"] == _MC_REPS
    assert out.loc["archive", "crit_n"] == _MC_REPS
    # every replicate has a critical path; each rate consistent
    assert (out.crit_n <= _MC_REPS).all()
    for t, row in out.iterrows():
        assert abs(row.crit_rate - round(row.crit_n / _MC_REPS, 6)) < 1e-6


def test_schedule_mc_spreads_risk_across_branches(spark):
    """The PERT insight the key exists for: the deterministic CPM says
    the dbt branch is non-critical (it has slack), but under ±20%
    jitter it must capture SOME replicates — criticality is a
    distribution, not a binary."""
    out = (
        REGISTRY["ops_schedule_monte_carlo"].spark(spark, SF_DIR)
        .toPandas().set_index("task")
    )
    cpm = (
        REGISTRY["ops_dag_critical_path"].spark(spark, SF_DIR)
        .toPandas().set_index("task")
    )
    slack_tasks = cpm[~cpm.is_critical].index
    assert len(slack_tasks) > 0
    # at least one slack-bearing task goes critical in some replicate
    assert out.loc[slack_tasks, "crit_n"].sum() > 0
    # and none of them dominates every replicate
    assert (out.loc[slack_tasks, "crit_n"] < _MC_REPS).all()
