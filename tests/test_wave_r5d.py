"""Semantic laws for the r5f wave: sampled-source Brandes betweenness."""

from __future__ import annotations

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from gcp_de_data_pipeline_cc_spark.plans.graph import _btw_sampled_frame
from tests.conftest import SF_DIR


def test_all_sources_recovers_full_betweenness(spark):
    """mod=1 samples EVERY source, so the Brandes backward accumulation
    must reproduce the all-pairs pair-form key up to micro-unit DIV
    truncation (each DAG edge truncates < 1e-6, amplified by at most
    the sigma ratios along one backward sweep)."""
    full = {
        r.n_name: r.betweenness
        for r in REGISTRY["graph_betweenness"].spark(spark, SF_DIR).collect()
    }
    est = {
        r.n_name: r.bc_est
        for r in _btw_sampled_frame(spark, SF_DIR, 1).collect()
    }
    assert set(est) == set(full)
    for name, bc in full.items():
        assert abs(est[name] - bc) <= max(0.05, 0.01 * bc), (
            name, est[name], bc,
        )


def test_sampled_estimator_shape(spark):
    """The registered mod=5 sample: one row per nation, the source count
    is the planted |{0,5,10,15,20} ∩ graph|, estimates are nonnegative
    and somebody brokers something."""
    out = REGISTRY["graph_betweenness_sampled"].spark(spark, SF_DIR).toPandas()
    nn = out.n_sources.iloc[0]
    assert (out.n_sources == nn).all() and 1 <= nn <= 5
    assert (out.bc_est >= 0).all()
    assert out.bc_est.max() > 0
    assert (out.bc_micro_sampled >= 0).all()
