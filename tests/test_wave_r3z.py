"""Semantic laws for the r3z wave: modularity scoring and frequent
triples."""

from __future__ import annotations

import datetime as dt
import itertools

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _day(i: int = 1, h: int = 12) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=i, hours=h)


def _write_brand_orders(spark, tmp_path, orders):
    """orders: list of brand lists; writes part + lineitem tables."""
    brands = sorted({b for o in orders for b in o})
    bkey = {b: i + 1 for i, b in enumerate(brands)}
    spark.createDataFrame(
        [(bkey[b], f"n{b}", b, "t", 1, 1.0) for b in brands],
        "p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING, "
        "p_size INT, p_retailprice DOUBLE",
    ).write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")
    li = []
    for oid, basket in enumerate(orders, start=1):
        li += [(oid, bkey[b]) for b in basket]
    spark.createDataFrame(
        [(o, p, 1, i, 1.0, 1.0, 0.0, 0.0, "N", "O", _day())
         for i, (o, p) in enumerate(li)],
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, "
        "l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, "
        "l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING, "
        "l_linestatus STRING, l_shipdate TIMESTAMP",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")


# ------------------------------------------------------------ modularity

def test_modularity_single_community_is_zero(spark, tmp_path):
    # one clique -> LPA converges to one label -> Q = 0 exactly
    _write_brand_orders(spark, tmp_path, [["A", "B", "C"]] * 4)
    out = REGISTRY["graph_modularity"].spark(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].q_total == 0.0 and out[0].q_contrib == 0.0
    assert out[0].n_nodes == 3


def test_modularity_two_cliques_positive(spark, tmp_path):
    orders = [["A", "B", "C"]] * 5 + [["X", "Y", "Z"]] * 5 + [["A", "X"]]
    _write_brand_orders(spark, tmp_path, orders)
    out = REGISTRY["graph_modularity"].spark(spark, str(tmp_path)).collect()
    assert len(out) == 2
    assert out[0].q_total == out[1].q_total > 0.3
    assert {r.n_nodes for r in out} == {3}


def test_modularity_fixture_consistency(spark):
    out = REGISTRY["graph_modularity"].spark(spark, SF_DIR).collect()
    assert len(out) >= 1
    q_total = out[0].q_total
    assert all(r.q_total == q_total for r in out)
    assert -0.5 <= q_total <= 1.0
    assert abs(sum(r.q_contrib for r in out) - q_total) < 1e-4
    # w_in never exceeds the community's degree sum
    for r in out:
        assert 0 <= r.w_in_2 <= r.deg_sum


# --------------------------------------------------------------- triples

def test_triples_planted_bundle(spark, tmp_path):
    # plant an A,B,C bundle in 6 of 20 orders; fill the rest with
    # non-repeating noise pairs so no other triple reaches support 5
    orders = [["A", "B", "C"]] * 6
    noise = ["D", "E", "F", "G", "H", "I", "J"]
    for i in range(14):
        orders.append([noise[i % 7], noise[(i + 1) % 7]])
    _write_brand_orders(spark, tmp_path, orders)
    out = REGISTRY["market_basket_triples"].spark(spark, str(tmp_path)).collect()
    assert [(r.brand_a, r.brand_b, r.brand_c, r.n_abc) for r in out] == \
        [("A", "B", "C", 6)]
    r = out[0]
    # lift = n_abc * N^2 / (ca*cb*cc) = 6*400/216
    assert abs(r.lift3 - 6 * 400 / 216) < 1e-4
    assert abs(r.support - 0.3) < 1e-9


def test_triples_fixture_laws(spark):
    out = REGISTRY["market_basket_triples"].spark(spark, SF_DIR).collect()
    assert 0 < len(out) <= 15
    lifts = [r.lift3 for r in out]
    assert lifts == sorted(lifts, reverse=True)
    for r in out:
        assert r.brand_a < r.brand_b < r.brand_c  # canonical
        assert r.n_abc >= 5 and 0 < r.support <= 1
