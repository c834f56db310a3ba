"""Semantic laws for the r4v wave: length-bucketed batching audit +
temperature-scaled mixing weights."""

from __future__ import annotations

import math

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")


# --------------------------------------------------------------------------
# train_length_buckets
# --------------------------------------------------------------------------


def test_length_buckets_partition_and_conserve(spark):
    out = (
        REGISTRY["train_length_buckets"]
        .spark(spark, SF_DIR)
        .toPandas()
        .sort_values("bucket")
    )
    assert list(out.bucket) == list(range(8))
    # equal-population split: bucket sizes differ by at most 1
    assert out.n_docs.max() - out.n_docs.min() <= 1
    # buckets tile the length axis in order
    for a, b in zip(out.itertuples(), list(out.itertuples())[1:]):
        assert a.max_tok <= b.min_tok
    # waste bookkeeping: padded = sum + waste, and the global baseline
    # dominates the bucketed total
    assert (out.padded_tok == out.sum_tok + out.waste_tok).all()
    assert (out.bucketed_total_waste <= out.single_bucket_waste).all()
    assert out.bucketed_total_waste.iloc[0] == out.waste_tok.sum()
    assert 0.0 <= out.savings_pct.iloc[0] <= 1.0


def test_length_buckets_uniform_lengths_zero_waste(spark, tmp_path):
    # identical lengths -> every bucket (and the baseline) pads nothing
    rows = [(i, "a b c d", "en", "s", 7) for i in range(16)]
    _write_docs(spark, tmp_path, rows)
    out = REGISTRY["train_length_buckets"].spark(spark, str(tmp_path)).toPandas()
    assert (out.waste_tok == 0).all()
    assert out.single_bucket_waste.iloc[0] == 0
    # degenerate baseline: savings over a zero-waste baseline is NULL
    assert out.savings_pct.isna().all()


# --------------------------------------------------------------------------
# corpus_temperature_mix
# --------------------------------------------------------------------------


def test_temperature_mix_budget_conserved_and_boost_direction(spark):
    out = REGISTRY["corpus_temperature_mix"].spark(spark, SF_DIR).toPandas()
    assert out.alloc_tokens.sum() == 1_000_000
    # sqrt scaling: smallest source boosted, largest damped
    smallest = out.loc[out.tokens.idxmin()]
    largest = out.loc[out.tokens.idxmax()]
    assert smallest.boost > 1.0 > largest.boost
    # q_temp tracks sqrt(tokens) proportionally
    w = out.tokens.map(math.sqrt)
    expect = w / w.sum()
    assert ((out.q_temp - expect).abs() < 1e-4).all()
    # temperature flattens: q_temp spread strictly inside p_raw spread
    assert out.q_temp.max() < out.p_raw.max()
    assert out.q_temp.min() > out.p_raw.min()


def test_temperature_mix_equal_sources_equal_split(spark, tmp_path):
    rows = [
        (i, "tok " * 9 + "tok", "en", f"s{i % 4}", 40) for i in range(40)
    ]
    _write_docs(spark, tmp_path, rows)
    out = REGISTRY["corpus_temperature_mix"].spark(spark, str(tmp_path)).toPandas()
    assert len(out) == 4
    assert (out.alloc_tokens == 250_000).all()
    assert ((out.boost - 1.0).abs() < 1e-6).all()
