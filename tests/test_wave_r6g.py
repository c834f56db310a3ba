"""Semantic laws for the r6g wave: IVF index maintenance."""

from __future__ import annotations

import numpy as np

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_index_maintenance_conservation_and_flag_law(spark):
    """Arrivals are conserved across cells; the retrain flag is exactly
    the cross-multiplied 2x-fair-share predicate; growth matches the
    count ratio."""
    import math

    out = (
        REGISTRY["sim_index_maintenance"].spark(spark, SF_DIR).toPandas()
    )
    d_tot, b_tot = out.n_delta.sum(), out.n_base.sum()
    assert d_tot > 0 and b_tot > 0
    for _, r in out.iterrows():
        assert 0 <= r.n_crossed <= r.n_delta
        want_flag = r.n_delta * b_tot > 2 * d_tot * r.n_base
        assert bool(r.retrain_flag) == want_flag
        want_growth = math.floor(r.n_delta * 1e6 / r.n_base + 0.5) / 1e6
        assert abs(r.growth - want_growth) < 1e-9


def test_index_maintenance_planted_clusters_no_drift(spark, tmp_path):
    """Tight, well-separated clusters: every arrival is assigned to its
    own cluster's cell — zero cross-label drift, no retrain flags
    (arrivals land proportionally)."""
    rng = np.random.default_rng(13)
    centers = rng.normal(size=(6, 64))
    rows = []
    vid = 0
    for c in range(6):
        for _ in range(20):
            v = centers[c] + 0.01 * rng.normal(size=64)
            rows.append((vid, c, [float(x) for x in v]))
            vid += 1
    spark.createDataFrame(
        rows, "vec_id BIGINT, label BIGINT, embedding ARRAY<DOUBLE>"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = (
        REGISTRY["sim_index_maintenance"].spark(spark, str(tmp_path))
        .toPandas()
    )
    assert len(out) == 6
    assert (out.n_crossed == 0).all()
    assert out.n_delta.sum() == 24  # 120 vectors, 20% delta split
