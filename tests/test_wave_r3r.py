"""Semantic laws for the r3r wave: incremental MV maintenance and
common-neighbor link prediction."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _day(i: int, h: int = 12) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=i, hours=h)


# -------------------------------------------------------------------- mv

def test_mv_maintained_equals_recomputed(spark):
    """THE invariant of incremental view maintenance: folding the delta
    into the old aggregate must equal recomputing over the applied
    table."""
    out = {r.o_orderpriority: r for r in
           REGISTRY["mv_delta_maintain"].spark(spark, SF_DIR).collect()}
    s = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("g"),
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long").alias("cents"),
    )
    upd = F.col("k") % 10 == 0
    dele = (F.col("k") % 10 != 0) & (F.col("k") % 17 == 0)
    ins = (F.col("k") % 10 != 0) & (F.col("k") % 17 != 0) & (F.col("k") % 13 == 0)
    applied = (
        s.filter(~dele)
        .withColumn("cents", F.when(upd, F.col("cents") + 100)
                    .otherwise(F.col("cents")))
        .unionAll(s.filter(ins).select("k", "g",
                                       (2 * F.col("cents")).alias("cents")))
    )
    recomputed = {r.g: r for r in
                  applied.groupBy("g")
                  .agg(F.count("*").alias("n"), F.sum("cents").alias("s"))
                  .collect()}
    assert set(out) == set(recomputed)
    for g, r in out.items():
        assert (r.n1, r.sum1_cents) == (recomputed[g].n, recomputed[g].s), g


def test_mv_delta_is_small(spark):
    out = REGISTRY["mv_delta_maintain"].spark(spark, SF_DIR).collect()
    n0 = sum(r.n0 for r in out)
    n_ops = sum(r.n_ops for r in out)
    assert 0 < n_ops < n0  # the delta is a strict subset of the base


# ------------------------------------------------------------- link pred

def _write_edge_graph(spark, tmp_path, edges):
    li = []
    for oid, (u, v) in enumerate(edges, start=1):
        li += [(oid, 1, u), (oid, 2, v)]
    spark.createDataFrame(
        [(o, p, s, i, 1.0, 1.0, 0.0, 0.0, "N", "O", _day(1))
         for i, (o, p, s) in enumerate(li)],
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, "
        "l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, "
        "l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING, "
        "l_linestatus STRING, l_shipdate TIMESTAMP",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")


def test_linkpred_path_graph(spark, tmp_path):
    # 1-2-3: the only non-adjacent pair with a common neighbor is (1,3)
    _write_edge_graph(spark, tmp_path, [(1, 2), (2, 3)])
    out = REGISTRY["graph_link_prediction"].spark(spark, str(tmp_path)).collect()
    assert [(r.a, r.b, r.common, r.uni, r.jaccard) for r in out] == \
        [(1, 3, 1, 1, 1.0)]


def test_linkpred_square(spark, tmp_path):
    # 4-cycle: both diagonals predicted with jaccard 1.0
    _write_edge_graph(spark, tmp_path, [(1, 2), (2, 3), (3, 4), (1, 4)])
    out = REGISTRY["graph_link_prediction"].spark(spark, str(tmp_path)).collect()
    assert {(r.a, r.b, r.common, r.uni, r.jaccard) for r in out} == \
        {(1, 3, 2, 2, 1.0), (2, 4, 2, 2, 1.0)}


def test_linkpred_fixture_laws(spark, tmp_path):
    out = REGISTRY["graph_link_prediction"].spark(spark, SF_DIR).collect()
    assert 0 < len(out) <= 20
    for r in out:
        assert r.a < r.b and r.common >= 1
        assert r.uni >= r.common and 0 < r.jaccard <= 1.0
    # scores are reported in non-increasing order
    js = [r.jaccard for r in out]
    assert js == sorted(js, reverse=True)
