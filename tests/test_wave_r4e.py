"""Round-4 wave tests: udf_cogrouped determinism (the r3 driver flake)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _cents(micro_sum: int) -> float:
    return float((micro_sum + 50) // 100) / 100.0


def test_cogrouped_cent_rounding_is_order_free():
    # Adversarial half-cent boundary: line nets whose float sum depends
    # on addition order.  Quantize-before-sum must make every
    # permutation agree to the exact cent.
    rng = np.random.default_rng(7)
    ext = rng.uniform(900.0, 90000.0, size=200)
    disc = rng.integers(0, 11, size=200) / 100.0
    micro = np.floor(ext * (1 - disc) * 10000.0 + 0.5).astype("int64")
    base = _cents(int(micro.sum()))
    for seed in range(20):
        perm = np.random.default_rng(seed).permutation(200)
        assert _cents(int(micro[perm].sum())) == base


def test_udf_cogrouped_stable_across_runs(spark):
    # Two full executions of the shipped key hash-stable row-for-row —
    # the exact property the official r3 driver caught flaking.
    spec = REGISTRY["udf_cogrouped"]
    a = (
        spec.spark(spark, SF_DIR)
        .toPandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    b = (
        spec.spark(spark, SF_DIR)
        .toPandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # and every net_sum is an exact cent (no float residue)
    cents = a["net_sum"] * 100.0
    assert np.allclose(cents, np.round(cents))
