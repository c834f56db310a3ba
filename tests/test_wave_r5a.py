"""Semantic laws for the r5a wave: Sakoe-Chiba banded DTW."""

from __future__ import annotations

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from gcp_de_data_pipeline_cc_spark.plans.timeseries4 import (
    _DTW_BAND,
    _dtw_banded_frame,
)
from tests.conftest import SF_DIR


def test_band_wider_than_series_recovers_full_dtw(spark):
    """w >= n: every cell is in-band, so the banded DP IS the full DP —
    bit-exact equality with ts_dtw_distance."""
    full = REGISTRY["ts_dtw_distance"].spark(spark, SF_DIR).collect()[0]
    wide = _dtw_banded_frame(spark, SF_DIR, int(full.n_days)).collect()[0]
    assert wide.dtw_banded_l1 == full.dtw_l1
    assert wide.lockstep_l1 == full.lockstep_l1
    # with w = n the band never clips: every row evaluates min(n, i+w) -
    # max(1, i-w) + 1 = n cells
    assert wide.band_cells == wide.n_days * wide.n_days


def test_band_orders_between_full_and_lockstep(spark):
    """Constraint monotonicity: full DTW <= banded DTW <= lockstep L1
    (the diagonal is admissible at any w >= 0, wider bands only add
    admissible paths)."""
    full = REGISTRY["ts_dtw_distance"].spark(spark, SF_DIR).collect()[0]
    out = REGISTRY["ts_dtw_banded"].spark(spark, SF_DIR).collect()[0]
    assert full.dtw_l1 <= out.dtw_banded_l1 <= out.lockstep_l1
    assert out.warp_gain_banded >= 0
    # narrower band can only tighten the constraint further
    narrow = _dtw_banded_frame(spark, SF_DIR, 1).collect()[0]
    assert out.dtw_banded_l1 <= narrow.dtw_banded_l1 <= narrow.lockstep_l1


def test_band_caps_evaluated_cells(spark):
    """The scale claim as an output check: per-row work <= 2w+1, so
    band_cells <= n*(2w+1) and (for w < n/2) strictly below n^2."""
    out = REGISTRY["ts_dtw_banded"].spark(spark, SF_DIR).collect()[0]
    n, w = out.n_days, out.band_w
    assert w == _DTW_BAND
    assert out.full_cells == n * n
    assert out.band_cells <= n * (2 * w + 1)
    assert out.band_cells < out.full_cells  # the band binds on 30 days
