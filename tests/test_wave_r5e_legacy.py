"""Semantic laws for the r5e wave: Markov removal-effect attribution."""

from __future__ import annotations

import datetime

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_markov_attr_hand_computed(spark, tmp_path):
    # group A (10 users): view -> click -> purchase
    # group B (5 users): error, then journey ends (no purchase)
    rows = []
    eid = 0
    t0 = datetime.datetime(2024, 6, 1, 9, 0, 0)
    for u in range(10):
        for i, et in enumerate(["view", "click", "purchase"]):
            eid += 1
            rows.append((eid, u, et, t0 + datetime.timedelta(minutes=i), 1.0))
    for u in range(10, 15):
        eid += 1
        rows.append((eid, u, "error", t0, 1.0))
    spark.createDataFrame(
        rows,
        "event_id BIGINT, user_id BIGINT, event_type STRING, "
        "ts TIMESTAMP, value DOUBLE",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = (
        REGISTRY["attribution_markov"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .set_index("channel")
    )
    # chain: START -> view (10/15) -> click (1.0) -> CONV (1.0);
    #        START -> error (5/15) -> DROP
    # p(conv | START) = floor(10/15 * 1e6)/1e6 = 0.666666
    assert abs(out.loc["view", "p_conv_full"] - 0.666666) < 1e-9
    # removing view or click kills every conversion; error never converts
    assert out.loc["view", "p_conv_removed"] == 0.0
    assert out.loc["click", "p_conv_removed"] == 0.0
    assert abs(out.loc["error", "p_conv_removed"] - 0.666666) < 1e-9
    assert out.loc["view", "removal_effect_micro"] == 666666
    assert out.loc["click", "removal_effect_micro"] == 666666
    assert out.loc["error", "removal_effect_micro"] == 0
    assert out.loc["signup", "removal_effect_micro"] == 0
    assert abs(out.loc["view", "share"] - 0.5) < 1e-9
    assert abs(out.loc["click", "share"] - 0.5) < 1e-9


def test_markov_attr_sf_identities(spark):
    out = REGISTRY["attribution_markov"].spark(spark, SF_DIR).toPandas()
    assert sorted(out.channel) == ["click", "error", "signup", "view"]
    # removal can never raise conversion
    assert (out.p_conv_removed <= out.p_conv_full + 1e-9).all()
    # full-chain conversion probability is a constant across rows
    assert out.p_conv_full.nunique() == 1
    assert 0 < out.p_conv_full.iloc[0] <= 1
    # shares form a distribution over channels with positive effect
    if out.removal_effect_micro.sum() > 0:
        assert abs(out.share.sum() - 1.0) < 1e-4
