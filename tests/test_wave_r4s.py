"""Semantic laws for the r4s wave: Bradley-Terry + EB shrinkage."""

from __future__ import annotations

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_bt_recovers_planted_strength_order(spark):
    out = (
        REGISTRY["eval_elo_bt"]
        .spark(spark, SF_DIR)
        .toPandas()
        .sort_values("model_id")
        .reset_index(drop=True)
    )
    assert len(out) == 8
    # latent strengths are s_i = i+1: the top-rated model should come
    # from the strong half, the bottom-rated from the weak half
    by_rank = out.sort_values("rnk")
    assert by_rank.iloc[0]["model_id"] >= 4
    assert by_rank.iloc[-1]["model_id"] <= 3
    # ratings normalize to ~1 and every model played games
    assert abs(out["bt_score"].sum() - 1.0) < 1e-3
    assert (out["games"] > 0).all()
    assert (out["wins"] <= out["games"]).all()


def test_bt_win_rates_correlate_with_scores(spark):
    out = REGISTRY["eval_elo_bt"].spark(spark, SF_DIR).toPandas()
    wr = out["wins"] / out["games"]
    # Spearman by hand over 8 models: higher BT score <=> higher win rate
    rho = wr.rank().corr(out["bt_score"].rank())
    assert rho > 0.85


def test_eb_shrinkage_contracts_toward_global(spark):
    out = REGISTRY["stats_eb_shrinkage"].spark(spark, SF_DIR).toPandas()
    g = out["global_rate"].iloc[0]
    pop = out[out["n"] > 0]
    # shrunk estimates never overshoot: they sit between raw and prior
    assert (
        (pop["shrunk_rate"] - g).abs() <= (pop["raw_rate"] - g).abs() + 1e-6
    ).all()
    # weights grow with sample size
    s = pop.sort_values("n")
    assert s["self_weight"].is_monotonic_increasing
    # empty segments (if any) collapse fully onto the prior
    empty = out[out["n"] == 0]
    assert (empty["shrunk_rate"] - g).abs().max() < 1e-3 if len(empty) else True


def test_eb_shrinkage_formula(spark):
    out = REGISTRY["stats_eb_shrinkage"].spark(spark, SF_DIR).toPandas()
    g = out["global_rate"].iloc[0]
    for r in out.itertuples():
        want = (r.k + 200 * g) / (r.n + 200)
        assert abs(r.shrunk_rate - want) < 1e-4, r
