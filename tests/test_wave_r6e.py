"""Semantic laws for the r6e wave: Hilbert-curve layout."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from gcp_de_data_pipeline_cc_spark.plans.layout import (
    H_BITS,
    hilbert_index_np,
)
from tests.conftest import SF_DIR


def _xy2d_scalar(n_bits, x, y):
    """Textbook scalar xy2d — the independent reference."""
    d = 0
    s = 1 << (n_bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def test_hilbert_matches_scalar_reference():
    grid = np.arange(16)
    xs, ys = np.meshgrid(grid, grid)
    xs, ys = xs.ravel(), ys.ravel()
    got = hilbert_index_np(xs, ys, 4)
    want = np.array([_xy2d_scalar(4, int(a), int(b)) for a, b in zip(xs, ys)])
    assert (got == want).all()


def test_hilbert_is_bijective_and_adjacent():
    """The two properties that make the curve a layout key: every cell
    gets a distinct position (bijection onto [0, n²)) and CONSECUTIVE
    positions are grid-adjacent (|dx|+|dy| = 1) — the locality z-order
    lacks (Morton has jumps of arbitrary length)."""
    bits = 4
    n = 1 << bits
    grid = np.arange(n)
    xs, ys = np.meshgrid(grid, grid)
    xs, ys = xs.ravel(), ys.ravel()
    d = hilbert_index_np(xs, ys, bits)
    assert sorted(d) == list(range(n * n))
    by_d = {int(di): (int(a), int(b)) for di, a, b in zip(d, xs, ys)}
    for i in range(n * n - 1):
        (x1, y1), (x2, y2) = by_d[i], by_d[i + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (i, by_d[i], by_d[i + 1])


def test_hilbert_locality_not_worse_than_zorder(spark):
    """Files touched under the shared 2-D box filter: the Hilbert
    layout must not touch more files than the Morton layout (averaged
    over several boxes; per-box ties are allowed)."""
    # materialize both layouts via the registered keys
    REGISTRY["zorder_layout"].spark(spark, SF_DIR).count()
    REGISTRY["hilbert_layout"].spark(spark, SF_DIR).count()
    from gcp_de_data_pipeline_cc_spark.scratch import scratch_path

    zpath = f"{scratch_path('zorder')}/orders_z"
    hpath = f"{scratch_path('hilbert')}/orders_h"
    boxes = [
        (100, 500, "1996-01-01", "1997-01-01"),
        (1000, 1400, "1993-01-01", "1994-01-01"),
        (200, 260, "1995-06-01", "1995-09-01"),
        (700, 1200, "1997-01-01", "1997-07-01"),
    ]

    def files_touched(path, lo, hi, d0, d1):
        df = spark.read.parquet(path).filter(
            F.col("o_custkey").between(lo, hi)
            & (F.col("o_orderdate") >= F.lit(d0))
            & (F.col("o_orderdate") < F.lit(d1))
        )
        return df.select(
            F.input_file_name().alias("f")
        ).distinct().count()

    z_total = sum(files_touched(zpath, *b) for b in boxes)
    h_total = sum(files_touched(hpath, *b) for b in boxes)
    assert h_total <= z_total, (h_total, z_total)
