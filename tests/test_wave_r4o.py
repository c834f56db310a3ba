"""Semantic laws for the r4o wave: Misra-Gries heavy hitters + peaks."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.operators.scale import misra_gries_candidates
from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_mg_guarantee_on_high_cardinality_skew(spark):
    """A heavy value hidden in a sea of uniques: MG with k counters must
    keep it even though the stream cardinality is 100x k — the bounded-
    memory guarantee (count > N/k => candidate) under real decrements."""
    n_unique, n_heavy, k = 5000, 900, 16
    df = spark.range(n_unique).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("v")
    ).unionAll(
        spark.range(n_heavy).select(F.lit("HEAVY").alias("v"))
    ).repartition(4)
    cand = misra_gries_candidates(df, "v", k).toPandas()
    # bounded state: at most k candidates per partition
    assert len(cand) <= k * 4
    assert "HEAVY" in set(cand["v"])  # count 900 > N/k = 369


def test_mg_estimates_are_lower_bounds(spark):
    df = spark.range(300).select(
        (F.col("id") % 7).cast("string").alias("v")
    ).repartition(2)
    cand = misra_gries_candidates(df, "v", 32).toPandas()
    # k=32 > 7 distincts: no decrements ever fire, so per-partition
    # estimates are exact and their per-value sums recover true counts
    assert cand["est"].sum() == 300
    per_value = cand.groupby("v")["est"].sum()
    for v, est in per_value.items():
        true = 300 // 7 + (1 if int(v) < 300 % 7 else 0)
        assert est == true, (v, est, true)


def test_heavy_hitters_top10_is_exact(spark):
    out = REGISTRY["heavy_hitters_mg"].spark(spark, SF_DIR).toPandas()
    assert len(out) == 10
    # counts strictly ordered (desc, token tiebreak) and shares consistent
    assert (out["n_exact"].diff().dropna() <= 0).all()
    assert (out["n_exact"] <= out["n_stream"]).all()
    for r in out.itertuples():
        assert abs(r.share - round(r.n_exact / r.n_stream, 6)) < 2e-6


def _write_docs_texts(spark, tmp_path, texts):
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")


def test_heavy_hitters_guard_raises_on_flat_distribution(spark, tmp_path):
    """ADVICE r4: on a flat distribution (every token unique, vocab >> k)
    the top-10 is NOT provably complete — the structural guard must fail
    the query loudly instead of silently returning an arbitrary 10."""
    import pytest

    _write_docs_texts(spark, tmp_path, [f"tok{i:05d}" for i in range(2000)])
    with pytest.raises(Exception, match="not provably complete"):
        REGISTRY["heavy_hitters_mg"].spark(spark, str(tmp_path)).collect()


def test_heavy_hitters_guard_passes_when_bound_clears(spark, tmp_path):
    """Vocab >> k (decrements DO fire) but 10 planted heavies each clear
    N/k — the survival-bound branch certifies completeness and the
    result is exactly the planted set."""
    texts = [f"u{i:05d}" for i in range(2000)]
    for h in range(10):
        texts.extend([f"HEAVY{h}"] * 500)
    _write_docs_texts(spark, tmp_path, texts)
    out = REGISTRY["heavy_hitters_mg"].spark(spark, str(tmp_path)).toPandas()
    assert sorted(out["token"]) == [f"HEAVY{h}" for h in range(10)]
    assert (out["n_exact"] == 500).all()


def _write_daily_orders(spark, tmp_path, day_cents):
    rows = [
        (i + 1, 1, "O", c / 100.0, dt.date(2024, 1, 1) + dt.timedelta(days=i),
         "3-MEDIUM")
        for i, c in enumerate(day_cents)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate DATE, o_orderpriority STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")


def test_peak_detect_planted_spike(spark, tmp_path):
    cents = [10000] * 20
    cents[10] = 50000  # single spike
    _write_daily_orders(spark, tmp_path, cents)
    out = REGISTRY["ts_peak_detect"].spark(spark, str(tmp_path)).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["day"] == dt.date(2024, 1, 11)
    assert r["cents"] == 50000 and r["neighbor_max"] == 10000
    assert r["strength_cents"] == 40000


def test_peak_detect_flat_series_and_edges(spark, tmp_path):
    # flat series: nothing strictly dominates -> no peaks
    _write_daily_orders(spark, tmp_path, [5000] * 15)
    out = REGISTRY["ts_peak_detect"].spark(spark, str(tmp_path)).toPandas()
    assert len(out) == 0
    # a spike at the edge lacks a full neighborhood -> not certified
    cents = [10000] * 10
    cents[0] = 99999
    _write_daily_orders(spark, tmp_path, cents)
    out = REGISTRY["ts_peak_detect"].spark(spark, str(tmp_path)).toPandas()
    assert len(out) == 0
