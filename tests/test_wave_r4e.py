"""Semantic laws for the r4e wave: quantization ranking eval and the
Lorenz curve."""

from __future__ import annotations

import datetime as dt

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# ------------------------------------------------------- quantize eval

def test_quantize_eval_fixture_recall(spark):
    out = REGISTRY["embedding_quantize_eval"].spark(spark, SF_DIR).collect()
    assert len(out) > 0
    for r in out:
        assert r.k == 10 and 0 <= r.n_hit <= 10
        assert abs(r.recall - r.n_hit / 10) < 1e-9
    # int8 on 64-dim floats should barely move the top-10
    mean_recall = sum(r.recall for r in out) / len(out)
    assert mean_recall >= 0.8


def test_quantize_eval_identical_vectors_perfect(spark, tmp_path):
    # orthogonal unit vectors: quantization is exact (each has one
    # non-zero coord = scale*127), so the rankings must agree fully
    rows = []
    for i in range(12):
        v = [0.0] * 16
        v[i % 16] = 1.0 if i < 8 else 0.5
        rows.append((i * 25, v, 0))  # ids 0,25,50,... -> queries at %50
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = REGISTRY["embedding_quantize_eval"].spark(spark, str(tmp_path)).collect()
    assert len(out) > 0
    assert all(r.recall == 1.0 for r in out)


# ------------------------------------------------------------- lorenz

def test_lorenz_fixture_laws(spark):
    out = REGISTRY["agg_lorenz_curve"].spark(spark, SF_DIR).collect()
    assert 1 <= len(out) <= 10
    assert out[-1].pop_share == 1.0 and out[-1].revenue_share == 1.0
    pops = [r.pop_share for r in out]
    revs = [r.revenue_share for r in out]
    assert pops == sorted(pops) and revs == sorted(revs)
    # Lorenz curve lies on or below the diagonal (poorest-first order)
    for r in out:
        assert r.revenue_share <= r.pop_share + 1e-9


def test_lorenz_uniform_spend_is_diagonal(spark, tmp_path):
    spark.createDataFrame(
        [(i + 1, i + 1, "F", 100.0, dt.date(2024, 1, 1), "1-URGENT")
         for i in range(50)],
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate DATE, o_orderpriority STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    out = REGISTRY["agg_lorenz_curve"].spark(spark, str(tmp_path)).collect()
    for r in out:
        assert abs(r.revenue_share - r.pop_share) < 1e-9
