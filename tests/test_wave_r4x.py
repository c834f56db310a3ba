"""Semantic laws for the r4x wave: trade-graph centrality + effect sizes."""

from __future__ import annotations

import datetime
import math

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# --------------------------------------------------------------------------
# graph_closeness
# --------------------------------------------------------------------------


def test_closeness_shape_and_identities(spark):
    out = REGISTRY["graph_closeness"].spark(spark, SF_DIR).toPandas()
    assert len(out) == 25
    reach = out[out.n_reachable > 0]
    assert len(reach) > 0
    # identities: harmonic <= n_reachable (each term <= 1); closeness
    # <= 1 (sum_dist >= n_reachable); closeness = n/sum
    assert (reach.harmonic <= reach.n_reachable + 1e-9).all()
    assert (reach.closeness <= 1.0 + 1e-9).all()
    for _, r in reach.iterrows():
        assert abs(r.closeness - math.floor(r.n_reachable / r.sum_dist * 1e6 + 0.5) / 1e6) < 1e-9
    # distance-1 neighbors contribute exactly 1e6 micro-units; a node
    # with all-reachable-at-1 would have harmonic == n_reachable
    assert (reach.harmonic_micro <= reach.n_reachable * 1_000_000).all()


def test_closeness_symmetry_of_reachability(spark):
    # undirected graph: total reachable-pair count is even (u->v and
    # v->u both counted)
    out = REGISTRY["graph_closeness"].spark(spark, SF_DIR).toPandas()
    assert int(out.n_reachable.sum()) % 2 == 0
    assert int(out.sum_dist.sum()) % 2 == 0


# --------------------------------------------------------------------------
# ab_effect_sizes
# --------------------------------------------------------------------------


def test_effect_sizes_identities(spark):
    out = REGISTRY["ab_effect_sizes"].spark(spark, SF_DIR).toPandas().iloc[0]
    # hedges g is a strict shrink toward zero
    assert abs(out.hedges_g) < abs(out.cohens_d)
    assert out.hedges_g * out.cohens_d >= 0  # same sign
    # d sign matches the mean difference
    assert (out.mean_a - out.mean_b) * out.cohens_d >= 0
    # glass and d agree in sign; var_ratio positive
    assert out.glass_delta * out.cohens_d >= 0
    assert out.var_ratio > 0
    assert out.n_a > 0 and out.n_b > 0


def test_effect_sizes_planted_shift(spark, tmp_path):
    # arm assignment is md5-based on user_id; plant users with known
    # values: every user has ONE event in the experiment window.
    # Values: arm A users get 30.0, arm B users get 10.0, zero variance
    # would break pooled sd -> add one deviating user per arm.
    import hashlib

    rows = []
    eid = 0
    for uid in range(200):
        arm_a = hashlib.md5(f"arm:{uid}".encode()).hexdigest()[0] < "8"
        val = 30.0 if arm_a else 10.0
        if uid < 4:  # two per arm in expectation; exact split unknown
            val += 2.0
        rows.append(
            (
                eid,
                uid,
                "purchase",
                datetime.datetime(2024, 3, 20, 12, 0, 0),
                val,
                "s",
            )
        )
        eid += 1
    spark.createDataFrame(
        rows,
        "event_id BIGINT, user_id BIGINT, event_type STRING, "
        "ts TIMESTAMP, value DOUBLE, session_id STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = REGISTRY["ab_effect_sizes"].spark(spark, str(tmp_path)).toPandas().iloc[0]
    # the planted ~20-unit shift must dominate: d large and positive
    assert out.mean_a > out.mean_b
    assert out.cohens_d > 5
    # recompute d from the report's own means and the planted sds
    assert out.n_a + out.n_b == 200
