"""Semantic laws for the r3t wave: hard-negative mining and adaptive
sessionization."""

from __future__ import annotations

import datetime as dt

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _ts(sec: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


# ------------------------------------------------------------- hard negs

def _write_embeddings(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")


def test_hard_negatives_known_geometry(spark, tmp_path):
    # bucket-scoped contract: candidates must share a portable-LSH
    # bucket with the anchor.  Near-duplicates (the HARD negatives the
    # miner exists to find) collide; orthogonal EASY negatives are
    # pruned by design.  Verify the collision structure through the
    # same public bucket function instead of assuming it.
    import numpy as np
    from gcp_de_data_pipeline_cc_spark.operators.similarity import (
        PORTABLE_Q_SCALE,
        portable_int_planes,
    )

    vecs = {
        0: [1.0, 0.0, 0.0, 0.0],   # anchor (0 % 25 == 0)
        1: [1.0, 0.1, 0.0, 0.0],   # positive
        2: [1.0, 0.2, 0.0, 0.0],   # hardest negative
        3: [0.0, 1.0, 0.0, 0.0],   # orthogonal easy negatives
        4: [0.0, 0.0, 1.0, 0.0],
    }
    planes = portable_int_planes(32, 64)[:, :4]
    w = 2 ** np.arange(3, -1, -1, dtype=np.int64)
    codes = {
        k: tuple(
            ((planes @ np.floor(np.asarray(v) * PORTABLE_Q_SCALE + 0.5)
              .astype(np.int64)) > 0).reshape(8, 4) @ w
        )
        for k, v in vecs.items()
    }
    collides = {
        k: any(a == b for a, b in zip(codes[0], codes[k]))
        for k in (1, 2, 3, 4)
    }
    assert collides[1] and collides[2]          # hard pair survives
    assert not collides[3] and not collides[4]  # easy pair pruned

    _write_embeddings(
        spark, tmp_path, [(k, v, 0 if k <= 1 else 1) for k, v in vecs.items()]
    )
    out = REGISTRY["train_hard_negatives"].spark(spark, str(tmp_path)).collect()
    assert [(r.anchor_id, r.pos_id, r.neg_rank, r.neg_id) for r in out] == [
        (0, 1, 1, 2)
    ]
    r1 = out[0]
    assert r1.pos_cos > r1.neg_cos and r1.margin > 0


def test_hard_negatives_fixture_laws(spark):
    out = REGISTRY["train_hard_negatives"].spark(spark, SF_DIR).collect()
    per_anchor = {}
    for r in out:
        per_anchor.setdefault(r.anchor_id, []).append(r)
    labels = {r.vec_id: r.label for r in
              spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
              .select("vec_id", "label").collect()}
    for a, rows in per_anchor.items():
        rows.sort(key=lambda r: r.neg_rank)
        assert [r.neg_rank for r in rows] == list(range(1, len(rows) + 1))
        # negatives are reported hardest-first
        cosines = [r.neg_cos for r in rows]
        assert cosines == sorted(cosines, reverse=True)
        for r in rows:
            assert labels[r.pos_id] == labels[a]
            assert labels[r.neg_id] != labels[a]
            assert abs(r.margin - round(r.pos_cos - r.neg_cos, 4)) <= 2e-4


# ---------------------------------------------------------- sessionize

def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")


def test_adaptive_sessionize_constructed(spark, tmp_path):
    rows, eid = [], 0
    # user 1: rapid-fire with one huge gap; median 10 s -> floor 60 s wins
    for sec in [0, 10, 20, 30, 1000, 1010]:
        eid += 1
        rows.append((eid, _ts(sec), 1, "click", 1.0, "{}"))
    # user 2: slow cadence (100 s median -> 300 s threshold); a 250 s
    # gap must NOT break where a fixed 60 s timeout would
    for sec in [0, 100, 200, 450, 550]:
        eid += 1
        rows.append((eid, _ts(sec), 2, "view", 1.0, "{}"))
    # user 3: single event -> excluded (no median)
    eid += 1
    rows.append((eid, _ts(0), 3, "view", 1.0, "{}"))
    _write_events(spark, tmp_path, rows)
    out = {r.user_id: r for r in
           REGISTRY["sessionize_adaptive"].spark(spark, str(tmp_path))
           .collect()}
    assert set(out) == {1, 2}
    assert (out[1].n_events, out[1].n_sessions, out[1].thresh_us) == \
        (6, 2, 60_000_000)
    assert (out[2].n_events, out[2].n_sessions, out[2].thresh_us) == \
        (5, 1, 300_000_000)


def test_adaptive_sessionize_fixture_laws(spark):
    out = REGISTRY["sessionize_adaptive"].spark(spark, SF_DIR).collect()
    assert len(out) > 0
    for r in out:
        assert r.n_events >= 2  # single-event users excluded
        assert 1 <= r.n_sessions <= r.n_events
        assert r.thresh_us >= 60_000_000
