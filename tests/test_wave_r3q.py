"""Semantic laws for the r3q wave: AMS F2 sketch and exact two-pass
quantiles."""

from __future__ import annotations

import datetime as dt
import math

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _day(i: int, h: int = 12) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=i, hours=h)


# ------------------------------------------------------------------- ams

def _write_lineitem(spark, tmp_path, part_counts):
    # part_counts: {partkey: row count}
    rows, i = [], 0
    for pk, cnt in part_counts.items():
        for _ in range(cnt):
            i += 1
            rows.append((i, pk, 1, i, 1.0, 1.0, 0.0, 0.0, "N", "O", _day(1)))
    spark.createDataFrame(
        rows,
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, "
        "l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, "
        "l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING, "
        "l_linestatus STRING, l_shipdate TIMESTAMP",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")


def test_ams_single_key_is_exact(spark, tmp_path):
    # one key with count m: every estimator is (±m)^2 = m^2 = F2 exactly
    _write_lineitem(spark, tmp_path, {42: 7})
    r = REGISTRY["sketch_ams_f2"].spark(spark, str(tmp_path)).collect()[0]
    assert (r.n_rows, r.n_keys, r.f2_exact) == (7, 1, 49)
    assert r.est_mean == 49.0 and r.est_momed == 49.0
    assert r.rel_err_mean == 0.0


def test_ams_f2_bounds_and_estimate(spark, tmp_path):
    _write_lineitem(spark, tmp_path,
                    {k: (3 if k % 5 == 0 else 1) for k in range(1, 201)})
    r = REGISTRY["sketch_ams_f2"].spark(spark, str(tmp_path)).collect()[0]
    n, keys = r.n_rows, r.n_keys
    assert keys == 200 and n == 40 * 3 + 160
    assert r.f2_exact == 40 * 9 + 160  # sum c^2
    assert n <= r.f2_exact <= n * n
    # AMS guarantee: std of the 16-mean is sqrt(2/16)*F2; allow 4 sigma
    assert r.rel_err_mean <= 4 * math.sqrt(2.0 / 16)


def test_ams_fixture_sanity(spark):
    r = REGISTRY["sketch_ams_f2"].spark(spark, SF_DIR).collect()[0]
    assert r.n_rows <= r.f2_exact <= r.n_rows * r.n_rows
    assert r.est_mean > 0 and r.est_momed > 0
    assert r.rel_err_mean <= 4 * math.sqrt(2.0 / 16)


# ------------------------------------------------------------- quantiles

def _write_orders(spark, tmp_path, totals):
    spark.createDataFrame(
        [(i + 1, 1, "F", float(t), dt.date(2024, 1, 1), "1-URGENT")
         for i, t in enumerate(totals)],
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate DATE, o_orderpriority STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")


def test_quantile_known_sequence(spark, tmp_path):
    # totals 0.01 .. 1.00 -> cents 1..100; type-1 quantiles are the
    # rank-ceil(p*n) order statistics: 50, 90, 99
    _write_orders(spark, tmp_path, [i / 100 for i in range(1, 101)])
    out = {r.p: r for r in
           REGISTRY["quantile_exact_twopass"].spark(spark, str(tmp_path))
           .collect()}
    assert out[0.5].exact_cents == 50 and out[0.5].target_rank == 50
    assert out[0.9].exact_cents == 90
    assert out[0.99].exact_cents == 99
    assert all(r.n == 100 for r in out.values())


def test_quantile_constant_column(spark, tmp_path):
    _write_orders(spark, tmp_path, [123.45] * 37)
    out = REGISTRY["quantile_exact_twopass"].spark(spark, str(tmp_path)).collect()
    assert [r.exact_cents for r in out] == [12345] * 3


def test_quantile_matches_full_sort(spark):
    out = {r.p: r.exact_cents for r in
           REGISTRY["quantile_exact_twopass"].spark(spark, SF_DIR).collect()}
    vals = sorted(
        int(round(r.o_totalprice * 100)) for r in
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_totalprice").collect()
    )
    n = len(vals)
    for num, den, p in ((1, 2, 0.5), (9, 10, 0.9), (99, 100, 0.99)):
        k = (num * n + den - 1) // den
        assert out[p] == vals[k - 1]
    assert out[0.5] <= out[0.9] <= out[0.99]
