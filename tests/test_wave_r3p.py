"""Semantic laws for the r3p wave: Spearman rho and two-sample KS."""

from __future__ import annotations

import datetime as dt
import math

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _day(i: int, h: int = 12) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=i, hours=h)


# -------------------------------------------------------------- spearman

def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate DATE, o_orderpriority STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")


def _orders_for(spark, tmp_path, cust_spend):
    # cust_spend: {custkey: [order totals]}
    rows, oid = [], 0
    for ck, totals in cust_spend.items():
        for t in totals:
            oid += 1
            rows.append((oid, ck, "F", float(t), dt.date(2024, 1, 1), "1-URGENT"))
    _write_orders(spark, tmp_path, rows)


def test_spearman_perfect_monotone(spark, tmp_path):
    # frequency 1..4, spend strictly increasing with frequency -> rho = 1
    _orders_for(spark, tmp_path, {
        1: [10.0], 2: [20.0, 20.0], 3: [30.0] * 3, 4: [40.0] * 4,
    })
    r = REGISTRY["hypothesis_spearman"].spark(spark, str(tmp_path)).collect()[0]
    assert r.n == 4 and r.rho == 1.0


def test_spearman_perfect_inverse(spark, tmp_path):
    # more orders -> lower total spend -> rho = -1
    _orders_for(spark, tmp_path, {
        1: [100.0], 2: [10.0, 10.0], 3: [5.0] * 3, 4: [1.0] * 4,
    })
    r = REGISTRY["hypothesis_spearman"].spark(spark, str(tmp_path)).collect()[0]
    assert r.rho == -1.0


def test_spearman_matches_reference_formula(spark, tmp_path):
    # hand-computed tie-corrected rho over a small paired sample
    spend = {1: [10.0], 2: [10.0], 3: [20.0, 5.0], 4: [1.0, 1.0],
             5: [50.0, 1.0, 1.0]}
    _orders_for(spark, tmp_path, spend)
    xs = [len(v) for v in spend.values()]
    ys = [int(round(sum(v) * 100)) for v in spend.values()]

    def avg_ranks(vals):
        out = []
        for v in vals:
            below = sum(1 for o in vals if o < v)
            t = sum(1 for o in vals if o == v)
            out.append(below + (t + 1) / 2)
        return out

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(sum((a - mx) ** 2 for a in rx)
                    * sum((b - my) ** 2 for b in ry))
    want = num / den
    r = REGISTRY["hypothesis_spearman"].spark(spark, str(tmp_path)).collect()[0]
    assert abs(r.rho - want) < 1e-6 and r.n == n  # rho is 6-dp rounded


def test_spearman_fixture_bounds(spark):
    r = REGISTRY["hypothesis_spearman"].spark(spark, SF_DIR).collect()[0]
    assert -1.0 <= r.rho <= 1.0 and r.n > 0


# ------------------------------------------------------------------- ks

def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")


def test_ks_identical_distributions(spark, tmp_path):
    rows, eid = [], 0
    for v in [1.0, 2.0, 3.0, 4.0] * 5:
        for et in ("click", "view"):
            eid += 1
            rows.append((eid, _day(1), eid, et, v, "{}"))
    _write_events(spark, tmp_path, rows)
    r = REGISTRY["hypothesis_ks2"].spark(spark, str(tmp_path)).collect()[0]
    assert (r.n1, r.n2, r.d_num, r.ks_d) == (20, 20, 0, 0.0)
    assert not r.reject_05


def test_ks_disjoint_supports(spark, tmp_path):
    rows, eid = [], 0
    for v in range(20):  # clicks all below 1.00, views all above
        eid += 1
        rows.append((eid, _day(1), eid, "click", 0.01 * (v + 1), "{}"))
        eid += 1
        rows.append((eid, _day(1), eid, "view", 10.0 + v, "{}"))
    _write_events(spark, tmp_path, rows)
    r = REGISTRY["hypothesis_ks2"].spark(spark, str(tmp_path)).collect()[0]
    assert r.ks_d == 1.0 and r.d_num == 20 * 20
    assert r.reject_05  # crit at n1=n2=20 is ~0.43
    # scaled stat = D * sqrt(n1 n2 / (n1+n2)) = sqrt(10)
    assert abs(r.ks_scaled - math.sqrt(10)) < 1e-3


def test_ks_fixture_consistency(spark):
    r = REGISTRY["hypothesis_ks2"].spark(spark, SF_DIR).collect()[0]
    assert 0 <= r.ks_d <= 1.0
    assert 0 <= r.d_num <= r.n1 * r.n2
    assert r.reject_05 == (r.ks_scaled > 1.358 or
                           abs(r.ks_scaled - 1.358) < 1e-3)
