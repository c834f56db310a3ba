"""Semantic law for the r4h wave: top-N + OTHER conservation."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_topn_other_conserves_total(spark):
    out = REGISTRY["agg_topn_other"].spark(spark, SF_DIR).collect()
    li = load_table(spark, SF_DIR, "lineitem")
    total = li.select(
        F.sum(
            F.floor(F.col("l_extendedprice") * F.lit(100.0) + F.lit(0.5))
            .cast("long")
        ).alias("t")
    ).collect()[0].t
    assert sum(r.cents for r in out) == total          # nothing dropped
    assert abs(sum(r.revenue_share for r in out) - 1.0) < 1e-4
    assert out[-1].brand == "OTHER"
    # top rows are ranked by revenue descending
    tops = [r.cents for r in out if r.brand != "OTHER"]
    assert tops == sorted(tops, reverse=True)
    assert len(out) <= 6


def test_topn_other_ranks_contiguous(spark):
    out = REGISTRY["agg_topn_other"].spark(spark, SF_DIR).collect()
    assert [r.rnk for r in out] == list(range(1, len(out) + 1))
