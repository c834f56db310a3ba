"""Semantic laws for the r3y wave: mergeable quantile samples and
share-of-parent rollup."""

from __future__ import annotations

import datetime as dt

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR

_QS_SHARDS, _QS_PER_SHARD = 8, 32


# ---------------------------------------------------------- quantiles

def _write_orders(spark, tmp_path, totals):
    spark.createDataFrame(
        [(i + 1, 1, "F", float(t), dt.date(2024, 1, 1), "1-URGENT")
         for i, t in enumerate(totals)],
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate DATE, o_orderpriority STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")


def test_qs_small_input_is_exact(spark, tmp_path):
    # every shard has fewer than 32 rows -> step = 1 -> the "sample"
    # is the full data and every quantile is exact
    _write_orders(spark, tmp_path, [i / 100 for i in range(1, 101)])
    out = {r.p: r for r in
           REGISTRY["sketch_quantile_samples"].spark(spark, str(tmp_path))
           .collect()}
    for p in (0.5, 0.9, 0.99):
        assert out[p].est_cents == out[p].exact_cents
    assert out[0.5].exact_cents == 50


def test_qs_rank_error_bound(spark):
    out = REGISTRY["sketch_quantile_samples"].spark(spark, SF_DIR).collect()
    n = out[0].n
    vals = sorted(
        int(round(r.o_totalprice * 100)) for r in
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_totalprice").collect()
    )
    assert len(vals) == n
    # the merge loses at most one step per shard of rank precision
    bound = n // _QS_PER_SHARD + _QS_SHARDS
    import bisect
    for r in out:
        num, den = {0.5: (1, 2), 0.9: (9, 10), 0.99: (99, 100)}[r.p]
        k = (num * n + den - 1) // den
        lo = bisect.bisect_left(vals, r.est_cents)
        hi = bisect.bisect_right(vals, r.est_cents)
        # est's plausible rank interval must come within `bound` of k
        assert lo - bound <= k <= hi + bound
        assert r.exact_cents == vals[k - 1]


# ------------------------------------------------------------- rollup

def test_sop_children_sum_to_one(spark):
    out = REGISTRY["rollup_share_of_parent"].spark(spark, SF_DIR).collect()
    lvl0 = [r for r in out if r.lvl == 0]
    lvl1 = [r for r in out if r.lvl == 1]
    lvl2 = [r for r in out if r.lvl == 2]
    assert len(lvl0) == 1 and lvl0[0].share_of_parent == 1.0
    # regions' shares of total sum to 1
    assert abs(sum(r.share_of_parent for r in lvl1) - 1.0) < 1e-4
    # nations' shares sum to 1 within every region
    by_region = {}
    for r in lvl2:
        by_region.setdefault(r.region, []).append(r.share_of_parent)
    for region, shares in by_region.items():
        assert abs(sum(shares) - 1.0) < 1e-4, region
    # cents conservation across levels
    assert lvl0[0].rev_cents == sum(r.rev_cents for r in lvl1)
    assert lvl0[0].rev_cents == sum(r.rev_cents for r in lvl2)


def test_sop_level_counts(spark):
    out = REGISTRY["rollup_share_of_parent"].spark(spark, SF_DIR).collect()
    assert len([r for r in out if r.lvl == 1]) == 5   # regions
    lvl2 = [r for r in out if r.lvl == 2]
    assert len(lvl2) <= 25 and len(lvl2) >= 5
