"""Semantic laws for the r6j wave: coordinate sanity battery."""

from __future__ import annotations

import hashlib

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _mode(k):
    return int(
        hashlib.md5(f"geov:{k}".encode()).hexdigest()[:2], 16
    ) % 64


def test_geo_validity_matches_python(spark):
    import duckdb

    keys = [
        k for (k,) in duckdb.sql(
            f"SELECT c_custkey FROM '{SF_DIR}/customer.parquet'"
        ).fetchall()
    ]
    counts = {}
    for k in keys:
        m = _mode(k)
        lat0 = -6000 + (k * 7919 % 12000)
        lon0 = -18000 + (k * 104729 % 36000)
        if m == 0:
            lat, lon = 9100 + k % 500, lon0
        elif m == 1:
            lat, lon = lat0, -18100 - k % 500
        elif m == 2:
            lat, lon = 0, 0
        elif m == 3:
            lat, lon = lon0, lat0
        else:
            lat, lon = lat0, lon0
        if lat == 0 and lon == 0:
            v = "null_island"
        elif abs(lat) > 9000 and abs(lat) <= 18000 and abs(lon) <= 9000:
            v = "swapped_axes"
        elif abs(lat) > 9000:
            v = "lat_out_of_range"
        elif abs(lon) > 18000:
            v = "lon_out_of_range"
        else:
            v = "valid"
        counts[v] = counts.get(v, 0) + 1
    out = (
        REGISTRY["qc_geo_validity"].spark(spark, SF_DIR).toPandas()
        .set_index("verdict")
    )
    assert set(out.index) == set(counts)
    for v, n in counts.items():
        assert out.loc[v, "n"] == n
        assert out.loc[v, "ppm"] == n * 1_000_000 // len(keys)
    # the valid class dominates (~60/64 of the coin)
    assert out.loc["valid", "n"] > sum(
        n for v, n in counts.items() if v != "valid"
    )
