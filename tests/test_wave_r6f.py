"""Semantic laws for the r6f wave: filter ablation + Little's law."""

from __future__ import annotations

import datetime

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# --------------------------------------------------------------------------
# corpus_filter_ablation
# --------------------------------------------------------------------------


def test_ablation_is_consistent_with_the_battery(spark):
    out = (
        REGISTRY["corpus_filter_ablation"].spark(spark, SF_DIR).toPandas()
        .set_index("rule")
    )
    battery = REGISTRY["quality_gopher_rules"].spark(spark, SF_DIR).toPandas()
    n_docs = len(battery)
    n_pass = int(battery.pass_all.sum())
    assert (out.n_docs == n_docs).all()
    assert (out.n_pass == n_pass).all()
    # per-rule fail counts must match the battery's own flags
    flags = {
        "r1_word_count": "r1_word_count",
        "r2_mean_word_len": "r2_mean_word_len",
        "r3_stopwords": "r3_stopwords",
        "r4_alpha_fraction": "r4_alpha_fraction",
    }
    for rule, col in flags.items():
        assert out.loc[rule, "n_fail"] == int((~battery[col]).sum())
    # identities: only + shared = fail; relaxed corpus = pass + only
    assert (out.n_fail_only + out.n_fail_shared == out.n_fail).all()
    assert (out.n_pass_if_relaxed == out.n_pass + out.n_fail_only).all()
    assert (out.n_fail_only <= out.n_fail).all()


def test_ablation_unique_blame_sums(spark):
    out = REGISTRY["corpus_filter_ablation"].spark(spark, SF_DIR).toPandas()
    battery = REGISTRY["quality_gopher_rules"].spark(spark, SF_DIR).toPandas()
    # docs failing exactly one rule = sum of n_fail_only across rules
    cols = ["r1_word_count", "r2_mean_word_len",
            "r3_stopwords", "r4_alpha_fraction"]
    n_single_fail = int(
        ((~battery[cols]).sum(axis=1) == 1).sum()
    )
    assert out.n_fail_only.sum() == n_single_fail


# --------------------------------------------------------------------------
# ops_littles_law
# --------------------------------------------------------------------------


def test_littles_law_identity_on_real_data(spark):
    out = REGISTRY["ops_littles_law"].spark(spark, SF_DIR).toPandas().iloc[0]
    # the sweep-line integral and the duration sum are the same number
    assert bool(out.identity_exact)
    assert out.sweep_mn == out.total_dur_mn
    assert out.n_sessions > 0
    assert out.window_mn > 0
    # L = lambda * W up to the two quantizations
    lam_mn = out.n_sessions / out.window_mn
    w = out.total_dur_mn / out.n_sessions
    assert abs(out.l_timeavg - lam_mn * w) < 1e-4


def test_littles_law_hand_scenario(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1, 10)

    def ts(mins):
        return t0 + datetime.timedelta(minutes=mins)

    rows = [
        # user 1: session [0, 20]; user 2: session [10, 40] — overlap
        # [10, 20] has concurrency 2; total dur = 20 + 30 = 50
        (1, ts(0), 1, "click", 0.0, "{}"),
        (2, ts(20), 1, "view", 0.0, "{}"),
        (3, ts(10), 2, "click", 0.0, "{}"),
        (4, ts(40), 2, "view", 0.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = (
        REGISTRY["ops_littles_law"].spark(spark, str(tmp_path))
        .toPandas().iloc[0]
    )
    assert out.n_sessions == 2
    assert out.total_dur_mn == 50
    assert out.window_mn == 40
    assert out.sweep_mn == 50
    assert bool(out.identity_exact)
    assert out.w_mean_mn == 25
    assert out.l_timeavg == 1.25  # 50 busy-minutes over a 40-min window
