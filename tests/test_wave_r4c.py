"""Semantic laws for the r4c wave: greedy packing eval and the anomaly
ensemble."""

from __future__ import annotations

import datetime as dt

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# ------------------------------------------------------------- packing

def _write_docs(spark, tmp_path, docs):
    # docs: {doc_id: n_tokens} -> text of that many single-char words
    spark.createDataFrame(
        [(i, " ".join(["w"] * n), "en", "s0", 2 * n) for i, n in docs.items()],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")


def test_pack_greedy_hand_computed(spark, tmp_path):
    # capacity 512; lens 300,300,400,500,12 ->
    # pack1: 300 (300+300>512 -> close, waste 212)
    # pack2: 300 (+400>512 -> close, waste 212)
    # pack3: 400 (+500>512 -> close, waste 112)
    # pack4: 500+12=512 (full) -> tail waste 0
    _write_docs(spark, tmp_path, {0: 300, 1: 300, 2: 400, 3: 500, 4: 12})
    r = REGISTRY["train_pack_greedy_eval"].spark(spark, str(tmp_path)).collect()
    assert len(r) == 1
    r = r[0]
    assert (r.n_docs, r.total_tokens) == (5, 1512)
    assert r.n_packs == 4
    assert r.waste_tokens == 212 + 212 + 112
    assert r.lower_bound_packs == 3  # ceil(1512/512)
    assert abs(r.utilization - 1512 / (4 * 512)) < 1e-6


def test_pack_greedy_conservation(spark):
    out = REGISTRY["train_pack_greedy_eval"].spark(spark, SF_DIR).collect()
    for r in out:
        # tokens + waste exactly fill the packs
        assert r.total_tokens + r.waste_tokens == r.n_packs * 512
        assert r.n_packs >= r.lower_bound_packs
        assert 0 < r.utilization <= 1.0


# ------------------------------------------------------------ ensemble

def _write_events(spark, tmp_path, day_cents):
    rows = [(i + 1, dt.datetime(2024, 1, 1 + i, 12), 1, "click",
             c / 100, "{}")
            for i, c in enumerate(day_cents)]
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")


def test_ensemble_planted_spike(spark, tmp_path):
    # 20 quiet days at ~1000 cents, one 100x spike: all three detectors
    # must flag the spike and nothing else
    cents = [1000 + (i % 5) for i in range(20)] + [100000]
    _write_events(spark, tmp_path, cents)
    out = REGISTRY["anomaly_ensemble"].spark(spark, str(tmp_path)).collect()
    flagged = [r for r in out if r.is_anomaly]
    assert len(flagged) == 1
    spike = flagged[0]
    assert spike.cents == 100000
    assert spike.z_flag and spike.mad_flag and spike.iqr_flag
    assert spike.votes == 3


def test_ensemble_quiet_series_clean(spark, tmp_path):
    _write_events(spark, tmp_path, [1000 + (i % 7) for i in range(21)])
    out = REGISTRY["anomaly_ensemble"].spark(spark, str(tmp_path)).collect()
    assert all(not r.is_anomaly for r in out)


def test_ensemble_fixture_consistency(spark):
    out = REGISTRY["anomaly_ensemble"].spark(spark, SF_DIR).collect()
    assert len(out) > 0
    for r in out:
        votes = sum([r.z_flag, r.mad_flag, r.iqr_flag])
        assert r.votes == votes
        assert r.is_anomaly == (votes >= 2)
