"""Semantic laws for the r3i wave: classical seasonal decomposition and
the quantized distributed Gram matrix."""

from __future__ import annotations

import datetime as dt

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _day(i: int, h: int = 12) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=i, hours=h)


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")


# ------------------------------------------------------------------- stl

def test_stl_additive_identity_and_seasonal_centering(spark):
    out = REGISTRY["ts_stl_decompose"].spark(spark, SF_DIR).collect()
    assert len(out) == 24  # 30 fixture days minus 3-day edges each side
    for r in out:
        # x == trend + seasonal + residual, exact before the three
        # independent 4-dp roundings
        assert abs(r.x_cents - (r.trend + r.seasonal + r.residual)) <= 3e-4
    seasonal_by_wd = {}
    for r in out:
        seasonal_by_wd.setdefault(r.day.isoweekday(), set()).add(r.seasonal)
    # one seasonal value per weekday, centered to mean ~0
    assert all(len(v) == 1 for v in seasonal_by_wd.values())
    vals = [next(iter(v)) for v in seasonal_by_wd.values()]
    assert abs(sum(vals)) <= 7e-4


def test_stl_pure_weekly_pattern_has_zero_residual(spark, tmp_path):
    # x(d) depends only on weekday -> residual == 0, seasonal == p - mean
    bump = {1: 10.0, 2: 20.0, 3: 30.0, 4: 40.0, 5: 50.0, 6: 60.0, 7: 70.0}
    rows = []
    for i in range(21):
        d = _day(i)
        rows.append((i, d, 1, "click", bump[d.date().isoweekday()], "{}"))
    _write_events(spark, tmp_path, rows)
    out = REGISTRY["ts_stl_decompose"].spark(spark, str(tmp_path)).collect()
    assert len(out) == 15
    mean_cents = sum(bump.values()) / 7 * 100
    for r in out:
        assert r.residual == 0.0
        assert r.trend == round(mean_cents, 4)
        expect_seasonal = bump[r.day.isoweekday()] * 100 - mean_cents
        assert abs(r.seasonal - expect_seasonal) <= 1e-4


# ------------------------------------------------------------------ gram

def test_gram_fixture_shape_and_diagonal(spark):
    out = REGISTRY["embedding_gram_matrix"].spark(spark, SF_DIR).collect()
    assert len(out) == 64 * 65 // 2
    cells = {(r.i, r.j): r for r in out}
    for i in range(1, 65):
        assert cells[(i, i)].gram_q >= 0  # diagonal = sum of squares
    for r in out:
        assert r.i <= r.j
        assert r.gram == r.gram_q / 1e6


def test_gram_hand_computed_two_vectors(spark, tmp_path):
    v1 = [1.0] + [0.0] * 63
    v2 = [0.5, 0.5] + [0.0] * 62
    spark.createDataFrame(
        [(1, v1, 0), (2, v2, 1)],
        "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT",
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = {
        (r.i, r.j): r.gram_q
        for r in REGISTRY["embedding_gram_matrix"].spark(spark, str(tmp_path)).collect()
    }
    assert out[(1, 1)] == 1000 * 1000 + 500 * 500
    assert out[(1, 2)] == 1000 * 0 + 500 * 500
    assert out[(2, 2)] == 500 * 500
    assert out[(3, 64)] == 0
