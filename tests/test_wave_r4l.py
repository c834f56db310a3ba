"""Semantic laws for the r4l wave: BH false-discovery control + HITS."""

from __future__ import annotations

import datetime as dt

import duckdb

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from gcp_de_data_pipeline_cc_spark.plans.graph import _HITS_U
from gcp_de_data_pipeline_cc_spark.plans.stats3 import _BH_CRIT
from tests.conftest import SF_DIR


def _write_battery(spark, tmp_path, urgent_nation: int | None):
    """25 nations, 4 customers each, 20 orders per customer; nation
    ``urgent_nation`` (if set) gets ALL-urgent orders, everyone else a
    1-in-5 urgent mix."""
    nations = [(n, f"N{n:02d}", n % 5) for n in range(25)]
    custs = [
        (100 * n + i, f"c{n}-{i}", n, 0.0, "BUILDING")
        for n in range(25)
        for i in range(4)
    ]
    orders = []
    ok = 0
    for n in range(25):
        for i in range(4):
            for j in range(20):
                ok += 1
                urgent = (
                    n == urgent_nation
                    if urgent_nation is not None
                    else (j % 5 == 0)
                )
                orders.append(
                    (
                        ok,
                        100 * n + i,
                        "O",
                        100.0,
                        dt.date(2024, 1, 1 + j % 28),
                        "1-URGENT" if urgent else "3-MEDIUM",
                    )
                )
    spark.createDataFrame(
        nations, "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/nation.parquet")
    spark.createDataFrame(
        custs,
        "c_custkey BIGINT, c_name STRING, c_nationkey BIGINT, "
        "c_acctbal DOUBLE, c_mktsegment STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(
        orders,
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate DATE, o_orderpriority STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")


def test_fdr_planted_effect_is_rejected(spark, tmp_path):
    _write_battery(spark, tmp_path, urgent_nation=7)
    out = (
        REGISTRY["stats_fdr_bh"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .sort_values("rnk")
        .reset_index(drop=True)
    )
    assert len(out) == 25
    top = out.iloc[0]
    assert top["n_name"] == "N07" and top["rejected"]
    # BH rejections are exactly the rank prefix 1..k_max
    k = out["k_max"].iloc[0]
    assert (out["rejected"] == (out["rnk"] <= k)).all()
    # the all-urgent nation dominates; the uniform rest stay accepted
    assert k < 25 and not out[out["n_name"] != "N07"]["rejected"].iloc[5:].any()


def test_fdr_null_battery_rejects_nothing(spark, tmp_path):
    _write_battery(spark, tmp_path, urgent_nation=None)
    out = REGISTRY["stats_fdr_bh"].spark(spark, str(tmp_path)).toPandas()
    # perfectly homogeneous shares -> chi2 == 0 everywhere -> k_max 0
    assert out["k_max"].iloc[0] == 0
    assert not out["rejected"].any()


def test_fdr_ladder_is_monotone_and_embedded(spark):
    out = (
        REGISTRY["stats_fdr_bh"]
        .spark(spark, SF_DIR)
        .toPandas()
        .sort_values("rnk")
    )
    # smaller rank = smaller allowed p = LARGER critical statistic
    assert out["crit_bh"].is_monotonic_decreasing
    assert list(out["crit_bh"]) == list(_BH_CRIT)
    assert (out["rejected"] == (out["rnk"] <= out["k_max"])).all()


def _hits_reference(sf_dir: str):
    """The integer micro-unit HITS algorithm, recomputed in plain
    Python dicts from the raw parquet."""
    con = duckdb.connect()
    edges = con.execute(
        f"""
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
        JOIN '{sf_dir}/customer.parquet' c ON o.o_custkey = c.c_custkey
        JOIN '{sf_dir}/supplier.parquet' s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
        """
    ).fetchall()
    nations = [
        r[0]
        for r in con.execute(
            f"SELECT n_nationkey FROM '{sf_dir}/nation.parquet'"
        ).fetchall()
    ]
    score = {n: _HITS_U for n in nations}

    def step(score, inbound):
        raw = {}
        for src, dst, w in edges:
            gk, k = (dst, src) if inbound else (src, dst)
            raw[gk] = raw.get(gk, 0) + score.get(k, 0) * w
        t = sum(raw.values())
        return {n: (raw.get(n, 0) * _HITS_U) // t if t else 0 for n in nations}

    a = step(score, True)
    h = step(a, False)
    a = step(h, True)
    h = step(a, False)
    return a, h


def test_hits_matches_integer_reference(spark):
    out = REGISTRY["graph_hits"].spark(spark, SF_DIR).toPandas()
    con = duckdb.connect()
    names = dict(
        con.execute(
            f"SELECT n_nationkey, n_name FROM '{SF_DIR}/nation.parquet'"
        ).fetchall()
    )
    a, h = _hits_reference(SF_DIR)
    by_name = {names[k]: (a[k], h[k]) for k in a}
    for row in out.itertuples():
        want_a, want_h = by_name[row.n_name]
        assert row.auth_micro == want_a and row.hub_micro == want_h, row


def test_hits_l1_normalized_and_nonneg(spark):
    out = REGISTRY["graph_hits"].spark(spark, SF_DIR).toPandas()
    assert (out["auth_micro"] >= 0).all() and (out["hub_micro"] >= 0).all()
    # integer floor renormalization undershoots by < 1 unit per node
    assert _HITS_U - 25 <= out["auth_micro"].sum() <= _HITS_U
    assert _HITS_U - 25 <= out["hub_micro"].sum() <= _HITS_U
