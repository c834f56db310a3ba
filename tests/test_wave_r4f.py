"""Semantic laws for the r4f wave: assortativity and feature hashing."""

from __future__ import annotations

import datetime as dt

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _day(i: int = 1, h: int = 12) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=i, hours=h)


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


# --------------------------------------------------------- assortativity

def test_assortativity_star_is_minus_one(spark, tmp_path):
    # star: hub 1 to leaves 2..6 — perfectly disassortative, r = -1
    _write_edge_graph(spark, tmp_path, [(1, k) for k in range(2, 7)])
    r = REGISTRY["graph_assortativity"].spark(spark, str(tmp_path)).collect()[0]
    assert r.m == 5 and r.assortativity == -1.0


def test_assortativity_regular_graph_is_null(spark, tmp_path):
    # 4-cycle: every degree is 2 -> zero degree variance -> NULL
    _write_edge_graph(spark, tmp_path, [(1, 2), (2, 3), (3, 4), (1, 4)])
    r = REGISTRY["graph_assortativity"].spark(spark, str(tmp_path)).collect()[0]
    assert r.m == 4 and r.assortativity is None


def test_assortativity_fixture_bounds(spark):
    r = REGISTRY["graph_assortativity"].spark(spark, SF_DIR).collect()[0]
    assert r.m > 0
    if r.assortativity is not None:
        assert -1.0 <= r.assortativity <= 1.0
    # moment sanity: Cauchy-Schwarz-ish bound s1 <= s3/2 is NOT general,
    # but the mean-square always dominates: 2*m*s3 >= s2*s2 - tiny
    assert 2 * r.m * r.s3 >= r.s2 * r.s2


# ------------------------------------------------------- feature hashing

def test_feature_hashing_structural_laws(spark):
    r = REGISTRY["text_feature_hashing"].spark(spark, SF_DIR).collect()[0]
    assert r.n_buckets == 256
    assert r.buckets_used <= min(256, r.n_distinct_tokens)
    # every token beyond the first in a bucket is a collision
    assert r.n_collided_tokens == r.n_distinct_tokens - r.buckets_used
    # pigeonhole: with V > B there are at least V - B collisions
    if r.n_distinct_tokens > 256:
        assert r.n_collided_tokens >= r.n_distinct_tokens - 256
    assert 0 <= r.collision_rate < 1
    assert r.max_load >= (r.n_distinct_tokens + 255) // 256


def test_feature_hashing_tiny_vocab_no_collisions(spark, tmp_path):
    spark.createDataFrame(
        [(0, "alpha beta gamma", "en", "s0", 16)],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    r = REGISTRY["text_feature_hashing"].spark(spark, str(tmp_path)).collect()[0]
    assert r.n_distinct_tokens == 3
    # 3 tokens in 256 buckets: collisions possible but this vocabulary
    # is collision-free under the portable hash (pinned)
    assert r.buckets_used == 3 and r.n_collided_tokens == 0
