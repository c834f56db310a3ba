"""Semantic laws for the r4r wave: rec-list metrics + trigram matching."""

from __future__ import annotations

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from gcp_de_data_pipeline_cc_spark.plans.relational_ext8 import _TRGM_PROBES
from tests.conftest import SF_DIR


def test_coverage_metrics_consistent_with_knn(spark):
    knn = REGISTRY["recsys_item_knn"].spark(spark, SF_DIR).toPandas()
    out = REGISTRY["recsys_coverage"].spark(spark, SF_DIR).toPandas()
    r = out.iloc[0]
    assert r["n_slots"] == len(knn)
    assert r["n_items"] == knn["item"].nunique()
    assert r["distinct_recommended"] == knn["neighbor"].nunique()
    assert abs(
        r["coverage"] - round(knn["neighbor"].nunique() / knn["item"].nunique(), 4)
    ) < 2e-4
    top_share = knn["neighbor"].value_counts().iloc[0] / len(knn)
    assert abs(r["top_neighbor_share"] - round(top_share, 4)) < 2e-4


def test_coverage_bounds(spark):
    r = REGISTRY["recsys_coverage"].spark(spark, SF_DIR).toPandas().iloc[0]
    assert 0 < r["coverage"] <= 1.0
    assert 0 < r["top_neighbor_share"] <= 1.0
    # novelty of any recommended brand is at most log2(total/1) bits
    assert r["mean_novelty_bits"] > 0


def test_trigram_resolves_each_typo_to_its_source(spark):
    out = REGISTRY["fn_trigram_sim"].spark(spark, SF_DIR).toPandas()
    best = out[out["rnk"] == 1].set_index("probe")["match"]
    # the planted one-edit typos resolve to their originals
    assert best["cold wigdet"] == "cold widget"
    assert best["smal widget"] == "small widget"
    assert best["blue rodd"] == "blue rod"


def test_trigram_sim_is_jaccard(spark):
    out = REGISTRY["fn_trigram_sim"].spark(spark, SF_DIR).toPandas()
    probes = dict(_TRGM_PROBES)

    def trigs(s):
        return {s[i : i + 3] for i in range(len(s) - 2)}

    for r in out.itertuples():
        a, b = trigs(r.match), trigs(probes[r.pid])
        inter = len(a & b)
        assert r.n_shared == inter
        assert abs(r.sim - round(inter / len(a | b), 4)) < 2e-4
    # similarity never exceeds 1 and decreases down each probe's list
    for pid, grp in out.groupby("pid"):
        sims = list(grp.sort_values("rnk")["sim"])
        assert sims == sorted(sims, reverse=True)
