"""Semantic laws for the r6r wave: Kendall tau-b and the trimmed mean."""

from __future__ import annotations

import math

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _write_tpch_pair(spark, tmp_path, customers, orders):
    spark.createDataFrame(
        customers, "c_custkey BIGINT, c_nationkey BIGINT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(
        orders,
        "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE, "
        "o_orderpriority STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")


# ---------------------------------------------------------------------------
# hypothesis_kendall
# ---------------------------------------------------------------------------

def _tau_b_python(xy):
    c = d = tx = ty = txy = 0
    n = len(xy)
    for i in range(n):
        for j in range(i + 1, n):
            (x1, y1), (x2, y2) = xy[i], xy[j]
            if x1 == x2 and y1 == y2:
                txy += 1
            elif x1 == x2:
                tx += 1
            elif y1 == y2:
                ty += 1
            elif (x1 < x2) == (y1 < y2):
                c += 1
            else:
                d += 1
    n0 = n * (n - 1) // 2
    return c, d, tx, ty, (c - d) / math.sqrt(
        (n0 - tx - txy) * (n0 - ty - txy)
    )


def test_kendall_matches_python(spark):
    import duckdb

    rows = duckdb.sql(
        f"""SELECT c.c_nationkey,
                   COUNT(DISTINCT c.c_custkey),
                   SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
            FROM '{SF_DIR}/orders.parquet' o
            JOIN '{SF_DIR}/customer.parquet' c
              ON o.o_custkey = c.c_custkey
            GROUP BY 1"""
    ).fetchall()
    xy = [(x, y) for _, x, y in rows]
    c, d, tx, ty, tau = _tau_b_python(xy)
    out = REGISTRY["hypothesis_kendall"].spark(spark, SF_DIR).toPandas()
    r = out.iloc[0]
    assert r.n == len(xy)
    assert (r.concordant, r.discordant) == (c, d)
    assert (r.ties_x, r.ties_y) == (tx, ty)
    assert abs(r.tau_b - math.floor(tau * 1e6 + 0.5) / 1e6) < 1e-12
    assert -1 <= r.tau_b <= 1


def test_kendall_perfect_and_inverted_orderings(spark, tmp_path):
    """5 nations where revenue order matches customer-count order
    exactly -> tau = 1; then inverted -> tau = -1."""
    customers, orders = [], []
    ck = oid = 0
    for nk in range(5):
        for _ in range(nk + 1):  # nation nk has nk+1 customers
            customers.append((ck, nk))
            orders.append((oid, ck, 1000.0 * (nk + 1), "1-URGENT"))
            ck += 1
            oid += 1
    _write_tpch_pair(spark, tmp_path, customers, orders)
    out = REGISTRY["hypothesis_kendall"].spark(spark, str(tmp_path)).toPandas()
    assert out.iloc[0].tau_b == 1.0 and out.iloc[0].discordant == 0
    # invert: nation totals strictly DECREASE with customer count
    # (per-customer price 1200*(5-nk)/(nk+1) -> total 120000*(5-nk))
    orders_inv = [
        (oid, ck, 1200.0 * (5 - nk) / (nk + 1), "1-URGENT")
        for oid, (ck, nk) in enumerate(customers)
    ]
    _write_tpch_pair(spark, tmp_path, customers, orders_inv)
    out = REGISTRY["hypothesis_kendall"].spark(spark, str(tmp_path)).toPandas()
    assert out.iloc[0].tau_b == -1.0 and out.iloc[0].concordant == 0


# ---------------------------------------------------------------------------
# agg_trimmed_mean
# ---------------------------------------------------------------------------

def test_trimmed_mean_matches_python(spark):
    import duckdb

    rows = duckdb.sql(
        f"""SELECT o_orderpriority,
                   CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT),
                   o_orderkey
            FROM '{SF_DIR}/orders.parquet'"""
    ).fetchall()
    groups: dict[str, list] = {}
    for p, cents, ok in rows:
        groups.setdefault(p, []).append((cents, ok))
    out = (
        REGISTRY["agg_trimmed_mean"].spark(spark, SF_DIR)
        .toPandas().set_index("o_orderpriority")
    )
    for p, vals in groups.items():
        vals.sort()
        n = len(vals)
        k = n // 10
        kept = [c for c, _ in vals[k:n - k]]
        r = out.loc[p]
        assert r.n == n and r.n_kept == n - 2 * k
        tm = math.floor(sum(kept) / len(kept) / 100 * 100 + 0.5) / 100
        rm = math.floor(sum(c for c, _ in vals) / n / 100 * 100 + 0.5) / 100
        assert abs(r.trimmed_mean - tm) < 1e-9
        assert abs(r.raw_mean - rm) < 1e-9


def test_trimmed_mean_ignores_whales(spark, tmp_path):
    """One 1e9 whale among 20 orders drags the raw mean ~5e7 but the
    10%-trim drops it entirely."""
    customers = [(i, 0) for i in range(20)]
    orders = [(i, i, 100.0, "1-URGENT") for i in range(19)]
    orders.append((19, 19, 1e9, "1-URGENT"))
    _write_tpch_pair(spark, tmp_path, customers, orders)
    out = REGISTRY["agg_trimmed_mean"].spark(spark, str(tmp_path)).toPandas()
    r = out.iloc[0]
    assert r.n == 20 and r.n_kept == 16
    assert r.trimmed_mean == 100.0
    assert r.raw_mean > 1e6
