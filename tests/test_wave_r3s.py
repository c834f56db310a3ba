"""Semantic laws for the r3s wave: range-partition planning and the
leakage-safe grouped split."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# ----------------------------------------------------------- range plan

def _write_orders(spark, tmp_path, totals):
    spark.createDataFrame(
        [(i + 1, 1, "F", float(t), dt.date(2024, 1, 1), "1-URGENT")
         for i, t in enumerate(totals)],
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate DATE, o_orderpriority STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")


def test_rpp_uniform_is_level(spark, tmp_path):
    # 80 distinct values -> 8 partitions of exactly 10 rows each
    _write_orders(spark, tmp_path, [i / 100 for i in range(1, 81)])
    out = REGISTRY["range_partition_plan"].spark(spark, str(tmp_path)).collect()
    assert [r.partition_id for r in out] == list(range(1, 9))
    assert all(r.n_rows == 10 and r.balance_ratio == 1.0 for r in out)
    # contiguous non-overlapping bounds
    for a, b in zip(out, out[1:]):
        assert a.hi_cents < b.lo_cents


def test_rpp_heavy_tie_never_splits(spark, tmp_path):
    # one value holds 60/80 rows: the tie group must land in ONE
    # partition (balance captured, not hidden by row-ntile splitting)
    _write_orders(spark, tmp_path, [5.00] * 60 + [i / 10 for i in range(1, 21)])
    out = REGISTRY["range_partition_plan"].spark(spark, str(tmp_path)).collect()
    assert sum(r.n_rows for r in out) == 80
    tie = [r for r in out if r.lo_cents <= 500 <= r.hi_cents]
    assert len(tie) == 1 and tie[0].n_rows >= 60
    assert max(r.balance_ratio for r in out) >= 6.0


def test_rpp_fixture_conservation(spark):
    out = REGISTRY["range_partition_plan"].spark(spark, SF_DIR).collect()
    n = load_table(spark, SF_DIR, "orders").count()
    assert sum(r.n_rows for r in out) == n
    assert len(out) <= 8
    for a, b in zip(out, out[1:]):
        assert a.hi_cents < b.lo_cents
    # order totals are near-unique -> plan should be close to level
    assert max(r.balance_ratio for r in out) < 1.2


# ------------------------------------------------------------- split

def test_split_no_group_spans(spark):
    out = REGISTRY["split_leakage_safe"].spark(spark, SF_DIR).collect()
    assert all(r.groups_spanning == 0 for r in out)
    docs = load_table(spark, SF_DIR, "documents")
    assert sum(r.n_docs for r in out) == docs.count()
    n_sources = docs.select("source").distinct().count()
    assert sum(r.n_groups for r in out) == n_sources  # partition of groups


def test_split_routing_is_by_group(spark):
    # every source maps to exactly one split in the raw routing
    from gcp_de_data_pipeline_cc_spark.operators.text import (
        portable_token_hash,
    )
    docs = load_table(spark, SF_DIR, "documents")
    bucket = F.pmod(portable_token_hash(F.col("source")), F.lit(10))
    per_doc = docs.select("doc_id", "source", bucket.alias("b"))
    spans = (
        per_doc.groupBy("source")
        .agg(F.countDistinct("b").alias("nb"))
        .filter(F.col("nb") > 1)
        .count()
    )
    assert spans == 0
