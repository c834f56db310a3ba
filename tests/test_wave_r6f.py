"""Semantic laws for the r6f wave: the MinHash bands×rows sweep."""

from __future__ import annotations

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_minhash_sweep_nesting_monotonicity(spark):
    """Because 2-row blocks refine 4-row blocks refine 8-row blocks of
    the SAME signature, the candidate sets are nested:
    cand(4,8) ⊆ cand(8,4) ⊆ cand(16,2).  Hence candidate counts,
    hits, and recalls are all monotone in the banding width, and
    precision runs the other way (wider banding admits more noise)."""
    out = (
        REGISTRY["dedup_minhash_sweep"].spark(spark, SF_DIR).toPandas()
        .set_index("bands")
    )
    assert list(out.index) == [16, 8, 4]
    assert (out.n_true == out.n_true.iloc[0]).all()
    assert out.loc[16, "n_candidates"] >= out.loc[8, "n_candidates"] >= out.loc[4, "n_candidates"]
    assert out.loc[16, "n_hit"] >= out.loc[8, "n_hit"] >= out.loc[4, "n_hit"]
    assert out.loc[16, "recall"] >= out.loc[8, "recall"] >= out.loc[4, "recall"]
    for b in (16, 8, 4):
        assert 0 <= out.loc[b, "n_hit"] <= min(
            out.loc[b, "n_candidates"], out.loc[b, "n_true"]
        )


def test_minhash_sweep_consistent_with_registered_config(spark):
    """The (8,4) sweep row counts the same unverified candidate set the
    registered dedup_minhash pipeline bands (same signature, same
    banding) — its recall must match the calibration key's high-J
    behavior: near-total recall at J >= 0.5 for the wide config."""
    out = (
        REGISTRY["dedup_minhash_sweep"].spark(spark, SF_DIR).toPandas()
        .set_index("bands")
    )
    # the wide (16,2) banding must catch nearly everything at J>=0.5
    assert out.loc[16, "recall"] >= 0.9
    # precision at the narrow end must not be worse than the wide end
    assert out.loc[4, "precision"] >= out.loc[16, "precision"] - 1e-9
