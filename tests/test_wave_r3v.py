"""Semantic laws for the r3v wave: k-core peeling and the two-phase
global skyline."""

from __future__ import annotations

import datetime as dt
import itertools

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _day(i: int = 1, h: int = 12) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=i, hours=h)


# ----------------------------------------------------------------- kcore

def _write_edge_graph(spark, tmp_path, edges):
    li = []
    for oid, (u, v) in enumerate(edges, start=1):
        li += [(oid, 1, u), (oid, 2, v)]
    spark.createDataFrame(
        [(o, p, s, i, 1.0, 1.0, 0.0, 0.0, "N", "O", _day())
         for i, (o, p, s) in enumerate(li)],
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, "
        "l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, "
        "l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING, "
        "l_linestatus STRING, l_shipdate TIMESTAMP",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")


def test_kcore_peels_tail_chain(spark, tmp_path):
    # K4 clique {1,2,3,4} (3-core) with a pendant chain 4-5-6: node 6
    # falls in round 1, node 5 only in round 2 — multi-round peeling
    k4 = list(itertools.combinations([1, 2, 3, 4], 2))
    _write_edge_graph(spark, tmp_path, k4 + [(4, 5), (5, 6)])
    out = REGISTRY["graph_kcore"].spark(spark, str(tmp_path)).collect()
    assert {r.suppkey for r in out} == {1, 2, 3, 4}
    assert all(r.core_deg == 3 and r.n_below_k == 0 for r in out)


def test_kcore_empty_when_no_core(spark, tmp_path):
    # a pure cycle of length 5 has degree 2 everywhere: no 3-core
    _write_edge_graph(spark, tmp_path,
                      [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1)])
    out = REGISTRY["graph_kcore"].spark(spark, str(tmp_path)).collect()
    assert out == []


def test_kcore_fixture_laws(spark):
    out = REGISTRY["graph_kcore"].spark(spark, SF_DIR).collect()
    if out:  # the fixture backbone may or may not sustain a 3-core
        below = out[0].n_below_k
        assert all(r.n_below_k == below for r in out)
        if below == 0:  # converged -> every member has core degree >= k
            assert all(r.core_deg >= 3 for r in out)


# --------------------------------------------------------------- skyline

def test_global_skyline_equals_brute_force(spark):
    out = REGISTRY["skyline_global_twophase"].spark(spark, SF_DIR).collect()
    got = {(r.p_partkey, r.price_cents, r.size) for r in out}
    pts = [
        (r.p_partkey, int(round(r.p_retailprice * 100)), r.p_size)
        for r in spark.read.parquet(f"{SF_DIR}/part.parquet")
        .select("p_partkey", "p_retailprice", "p_size").collect()
    ]
    expect = set()
    for k, pc, sz in pts:
        dominated = any(
            pc2 <= pc and sz2 >= sz and (pc2 < pc or sz2 > sz)
            for k2, pc2, sz2 in pts if k2 != k
        )
        if not dominated:
            expect.add((k, pc, sz))
    assert got == expect and len(got) > 0


def test_global_skyline_subset_of_local_fronts(spark):
    glob = {r.p_partkey for r in
            REGISTRY["skyline_global_twophase"].spark(spark, SF_DIR).collect()}
    local = {r.p_partkey for r in
             REGISTRY["skyline_pareto_front"].spark(spark, SF_DIR).collect()}
    assert glob <= local  # the divide-and-conquer law
