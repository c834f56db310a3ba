"""Semantic laws for the r6c wave: kNN-distance embedding outliers +
the slot-capped wave schedule."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_knn_outliers_planted_garbage(spark, tmp_path):
    """Plant one tight cluster of 30 plus 3 far-away garbage vectors:
    the garbage must occupy the first outlier ranks (lowest / NULL
    kNN cosine), the cluster members must score near 1."""
    import numpy as np

    rng = np.random.default_rng(11)
    center = rng.normal(size=64)
    rows = [
        (i, 0, [float(x) for x in center + 0.01 * rng.normal(size=64)])
        for i in range(30)
    ]
    # garbage: orthogonal-ish random directions far from the cluster
    for j in range(3):
        rows.append(
            (100 + j, 1, [float(x) for x in rng.normal(size=64) * 5.0])
        )
    spark.createDataFrame(
        rows, "vec_id BIGINT, label BIGINT, embedding ARRAY<DOUBLE>"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = (
        REGISTRY["embedding_knn_outliers"].spark(spark, str(tmp_path))
        .toPandas()
    )
    top3 = set(out.head(3).vec_id)
    assert top3 == {100, 101, 102}, out.head(5)
    # cluster members that made the report still score high
    members = out[out.vec_id < 100]
    assert (members.knn_cosine > 0.9).all()


def test_knn_outliers_fixture_shape(spark):
    out = (
        REGISTRY["embedding_knn_outliers"].spark(spark, SF_DIR).toPandas()
    )
    assert len(out) == 20
    # scored rows are valid cosines; isolated rows are NULL with 0 cands
    scored = out[out.knn_cosine.notna()]
    assert ((scored.knn_cosine >= -1.0001) & (scored.knn_cosine <= 1.0001)).all()
    assert (out[out.knn_cosine.isna()].n_neighbors == 0).all()
    # report is sorted most-isolated first (NULLs lead)
    vals = out.knn_cosine.tolist()
    nn = [v for v in vals if v == v]
    assert nn == sorted(nn)


def test_wave_schedule_bounds_and_precedence(spark):
    """Makespan sits between the CPM critical path (infinite workers)
    and the serial sum; waves respect every DAG edge; no wave holds
    more than _WAVE_SLOTS tasks."""
    from gcp_de_data_pipeline_cc_spark.plans.ops import (
        _EDGES,
        _TASKS,
        _WAVE_SLOTS,
    )

    out = REGISTRY["ops_wave_schedule"].spark(spark, SF_DIR).toPandas()
    assert len(out) == len(_TASKS)
    makespan = out.wave_end.max()
    serial = sum(d for _, d in _TASKS)
    cpm = REGISTRY["ops_dag_critical_path"].spark(spark, SF_DIR).toPandas()
    cp_len = cpm.ef.max()
    assert cp_len <= makespan <= serial
    # precedence: every edge's src wave ends before its dst wave starts
    row = out.set_index("task")
    for s, d in _EDGES:
        assert row.loc[s, "wave_end"] <= row.loc[d, "wave_start"]
    # slot cap
    per_wave = out.groupby(["level", "wave"]).size()
    assert (per_wave <= _WAVE_SLOTS).all()
    # waves tile the timeline: starts equal the running sum of durations
    waves = (
        out.groupby(["level", "wave"])
        .agg(ws=("wave_start", "first"), we=("wave_end", "first"))
        .sort_values(["level", "wave"])
    )
    prev_end = 0
    for _, r in waves.iterrows():
        assert r.ws == prev_end
        prev_end = r.we
