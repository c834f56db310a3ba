"""Semantic laws for the r4p wave: grouped jackknife + personalized PR."""

from __future__ import annotations

import math

import duckdb

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from gcp_de_data_pipeline_cc_spark.plans.graph import (
    _PPR_A_DEN,
    _PPR_A_NUM,
    _PPR_SEED,
    _PPR_U,
)
from tests.conftest import SF_DIR


def test_jackknife_matches_python_recompute(spark):
    out = REGISTRY["stats_jackknife"].spark(spark, SF_DIR).toPandas()
    con = duckdb.connect()
    g = con.execute(
        f"""
        SELECT s.s_nationkey,
               SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount)
                              * 100.0 + 0.5) AS BIGINT)) AS num_c,
               SUM(CAST(l.l_quantity AS BIGINT)) AS den_q
        FROM '{SF_DIR}/lineitem.parquet' l
        JOIN '{SF_DIR}/supplier.parquet' s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1
        """
    ).fetchall()
    G = len(g)
    sn = sum(r[1] for r in g)
    sd = sum(r[2] for r in g)
    r_loo = {
        r[0]: math.floor((sn - r[1]) / (sd - r[2]) / 100.0 * 1e6 + 0.5) / 1e6
        for r in g
    }
    for row in out.itertuples():
        assert abs(row.r_loo - r_loo[row.nationkey]) < 2e-6
    rbar = sum(r_loo.values()) / G
    se = math.sqrt(
        (G - 1) / G * sum((v - rbar) ** 2 for v in r_loo.values())
    )
    assert abs(out["se_jack"].iloc[0] - se) < 1e-4
    assert (out["n_groups"] == G).all()


def test_jackknife_loo_brackets_full_sample(spark):
    out = REGISTRY["stats_jackknife"].spark(spark, SF_DIR).toPandas()
    # deleting one group moves the ratio both ways around the full value
    assert out["r_loo"].min() <= out["r_full"].iloc[0] <= out["r_loo"].max()
    assert out["se_jack"].iloc[0] >= 0


def _ppr_reference(sf_dir: str):
    con = duckdb.connect()
    edges = con.execute(
        f"""
        SELECT c.c_nationkey, s.s_nationkey, COUNT(*)
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
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    p = {n: _PPR_U if n == _PPR_SEED else 0 for n in nations}
    for _ in range(3):
        nxt = {n: 0 for n in nations}
        for s, d, w in edges:
            nxt[d] += ((_PPR_A_DEN - _PPR_A_NUM) * p[s] * w) // (
                _PPR_A_DEN * outw[s]
            )
        nxt[_PPR_SEED] += (_PPR_A_NUM * _PPR_U) // _PPR_A_DEN
        p = nxt
    return p, len(edges)


def test_ppr_matches_integer_reference(spark):
    out = REGISTRY["graph_ppr"].spark(spark, SF_DIR).toPandas()
    con = duckdb.connect()
    names = dict(
        con.execute(
            f"SELECT n_name, n_nationkey FROM '{SF_DIR}/nation.parquet'"
        ).fetchall()
    )
    want, n_edges = _ppr_reference(SF_DIR)
    for row in out.itertuples():
        assert row.ppr_micro == want[names[row.n_name]], row
    # mass conservation up to the documented floor leak
    assert _PPR_U - 3 * (n_edges + 1) <= out["ppr_micro"].sum() <= _PPR_U


def test_ppr_seed_concentration(spark):
    out = REGISTRY["graph_ppr"].spark(spark, SF_DIR).toPandas()
    seed_score = out.loc[out["is_seed"], "ppr_micro"].iloc[0]
    # restart mass alone guarantees the seed at least alpha of the walk
    assert seed_score >= (_PPR_A_NUM * _PPR_U) // _PPR_A_DEN
    assert (out["ppr_micro"] >= 0).all()
