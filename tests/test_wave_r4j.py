"""Semantic laws for the r4j wave: one-way ANOVA."""

from __future__ import annotations

import datetime as dt

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _write_events(spark, tmp_path, day_cents):
    rows = [(i + 1, dt.datetime(2024, 1, 1, 12) + dt.timedelta(days=i),
             1, "click", c / 100, "{}")
            for i, c in enumerate(day_cents)]
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")


def test_anova_planted_weekday_effect(spark, tmp_path):
    # one weekday earns 10x every week for 8 weeks -> huge F, reject
    cents = []
    for d in range(56):
        cents.append(100000 if d % 7 == 3 else 10000 + d % 3)
    _write_events(spark, tmp_path, cents)
    r = REGISTRY["hypothesis_anova"].spark(spark, str(tmp_path)).collect()[0]
    assert (r.n_days, r.n_groups) == (56, 7)
    assert r.f_stat > 100 and r.reject_05


def test_anova_flat_series_accepts(spark, tmp_path):
    # identical revenue every day -> zero between-group variance, F = 0
    _write_events(spark, tmp_path, [10000] * 56)
    r = REGISTRY["hypothesis_anova"].spark(spark, str(tmp_path)).collect()[0]
    # zero within-group variance -> F undefined (NULL), no rejection
    assert r.f_stat is None and not r.reject_05


def test_anova_fixture_consistency(spark):
    r = REGISTRY["hypothesis_anova"].spark(spark, SF_DIR).collect()[0]
    assert r.n_groups <= 7 and r.n_days >= r.n_groups
    assert r.f_stat >= 0
    assert r.reject_05 == (r.f_stat > 2.099070 or
                           abs(r.f_stat - 2.099070) < 1e-3)
