"""Semantic laws for the r3o wave: 2D skyline and BFS k-hop."""

from __future__ import annotations

import datetime as dt
import itertools

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _day(i: int, h: int = 12) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=i, hours=h)


# --------------------------------------------------------------- skyline

def _write_parts(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING, "
        "p_size INT, p_retailprice DOUBLE",
    ).write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")


def test_skyline_constructed(spark, tmp_path):
    # brand A: (1.00,5) on front, (2.00,10) on front, (1.50,5) dominated
    # by (1.00,5); (1.00,7) dominates (1.00,5) at equal price;
    # (3.00,10) dominated by (2.00,10). brand B: equal (price,size)
    # twins both survive (neither dominates).
    _write_parts(spark, tmp_path, [
        (1, "a", "A", "t", 5, 1.00),
        (2, "b", "A", "t", 10, 2.00),
        (3, "c", "A", "t", 5, 1.50),
        (4, "d", "A", "t", 7, 1.00),
        (5, "e", "A", "t", 10, 3.00),
        (6, "f", "B", "t", 4, 9.99),
        (7, "g", "B", "t", 4, 9.99),
    ])
    out = REGISTRY["skyline_pareto_front"].spark(spark, str(tmp_path)).collect()
    got = {(r.p_brand, r.p_partkey) for r in out}
    assert got == {("A", 2), ("A", 4), ("B", 6), ("B", 7)}


def test_skyline_matches_brute_force(spark):
    # at sf0.001 the part table is small enough for the O(n^2) oracle
    out = REGISTRY["skyline_pareto_front"].spark(spark, SF_DIR).collect()
    sky = {(r.p_brand, r.p_partkey) for r in out}
    pts = [
        (r.p_brand, r.p_partkey, int(round(r.p_retailprice * 100)), r.p_size)
        for r in spark.read.parquet(f"{SF_DIR}/part.parquet")
        .select("p_brand", "p_partkey", "p_retailprice", "p_size")
        .collect()
    ]
    by_brand = {}
    for b, k, pc, sz in pts:
        by_brand.setdefault(b, []).append((k, pc, sz))
    expect = set()
    for b, rows in by_brand.items():
        for k, pc, sz in rows:
            dominated = any(
                (pc2 <= pc and sz2 >= sz and (pc2 < pc or sz2 > sz))
                for k2, pc2, sz2 in rows if k2 != k
            )
            if not dominated:
                expect.add((b, k))
    assert sky == expect and len(sky) > 0


def test_skyline_front_is_antichain(spark):
    out = REGISTRY["skyline_pareto_front"].spark(spark, SF_DIR).collect()
    for b, grp in itertools.groupby(out, key=lambda r: r.p_brand):
        grp = list(grp)
        for a, c in itertools.combinations(grp, 2):
            assert not (
                a.price_cents <= c.price_cents and a.size >= c.size
                and (a.price_cents < c.price_cents or a.size > c.size)
            )
            assert not (
                c.price_cents <= a.price_cents and c.size >= a.size
                and (c.price_cents < a.price_cents or c.size > a.size)
            )


# ------------------------------------------------------------------- bfs

def test_bfs_chain_distances(spark, tmp_path):
    # supplier chain 1-2-3-4-5-6 via one shared order per edge:
    # dist(1)=0 .. dist(5)=4; supplier 6 is 5 hops out -> excluded
    li = []
    for oid, (u, v) in enumerate([(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)],
                                 start=1):
        li += [(oid, 1, u), (oid, 2, v)]
    spark.createDataFrame(
        [(o, p, s, i, 1.0, 1.0, 0.0, 0.0, "N", "O", _day(1))
         for i, (o, p, s) in enumerate(li)],
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, "
        "l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, "
        "l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING, "
        "l_linestatus STRING, l_shipdate TIMESTAMP",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    out = {r.suppkey: r.dist for r in
           REGISTRY["graph_bfs_khop"].spark(spark, str(tmp_path)).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_bfs_fixture_shape(spark):
    out = REGISTRY["graph_bfs_khop"].spark(spark, SF_DIR).collect()
    dists = [r.dist for r in out]
    assert dists.count(0) == 1          # exactly one source
    assert all(0 <= d <= 4 for d in dists)
    assert len({r.suppkey for r in out}) == len(out)
    # BFS frontier property: no gaps in the realized distance levels
    levels = sorted(set(dists))
    assert levels == list(range(len(levels)))
