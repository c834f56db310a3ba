"""Semantic laws for the r3n wave: label propagation and KMV set ops."""

from __future__ import annotations

import datetime as dt

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _day(i: int, h: int = 12) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=i, hours=h)


# ------------------------------------------------------------------- lpa

def test_lpa_two_cliques_stay_separated(spark, tmp_path):
    # clique1 {A,B,C} co-purchased heavily, clique2 {X,Y,Z} likewise,
    # one weak bridge order contains A and X
    parts = [(i + 1, f"n{i}", b, "t", 1, 1.0) for i, b in
             enumerate(["A", "B", "C", "X", "Y", "Z"])]
    spark.createDataFrame(
        parts,
        "p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING, "
        "p_size INT, p_retailprice DOUBLE",
    ).write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")
    li = []
    oid = 0
    for _ in range(5):  # 5 orders each containing all of clique1
        oid += 1
        li += [(oid, pk) for pk in (1, 2, 3)]
    for _ in range(5):
        oid += 1
        li += [(oid, pk) for pk in (4, 5, 6)]
    oid += 1
    li += [(oid, 1), (oid, 4)]  # weak bridge
    spark.createDataFrame(
        [(o, p, 1, i, 1.0, 1.0, 0.0, 0.0, "N", "O", _day(1))
         for i, (o, p) in enumerate(li)],
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, "
        "l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, "
        "l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING, "
        "l_linestatus STRING, l_shipdate TIMESTAMP",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    out = {r.brand: r for r in
           REGISTRY["graph_label_propagation"].spark(spark, str(tmp_path)).collect()}
    assert set(out) == {"A", "B", "C", "X", "Y", "Z"}
    for b in ("A", "B", "C"):
        assert out[b].label_1 in {"A", "B", "C"}
        assert out[b].label_2 in {"A", "B", "C"}
    for b in ("X", "Y", "Z"):
        assert out[b].label_1 in {"X", "Y", "Z"}
        assert out[b].label_2 in {"X", "Y", "Z"}


def test_lpa_fixture_shape(spark):
    out = REGISTRY["graph_label_propagation"].spark(spark, SF_DIR).collect()
    brands = {r.brand for r in out}
    labels = {r.label_2 for r in out}
    assert len(out) == len(brands)
    assert labels <= brands  # labels are always node names


# ------------------------------------------------------------------- kmv

def test_kmv_fixture_consistency(spark):
    r = REGISTRY["sketch_kmv_setops"].spark(spark, SF_DIR).collect()[0]
    assert r.k == 64
    # exact set identities
    assert r.n_intersect_exact == r.n_a_exact + r.n_b_exact - r.n_union_exact
    assert max(r.n_a_exact, r.n_b_exact) <= r.n_union_exact
    # estimator sanity: ~1/sqrt(k-2) relative error, generous 3-sigma
    assert r.rel_err_union <= 0.4
    assert r.est_a > 0 and r.est_b > 0 and r.est_union > 0


def test_kmv_below_k_is_exact(spark, tmp_path):
    rows = []
    eid = 0
    for u in range(10):  # 10 click users
        eid += 1
        rows.append((eid, _day(1), u, "click", 1.0, "{}"))
    for u in range(7, 12):  # 5 purchase users, 3 overlap
        eid += 1
        rows.append((eid, _day(2), u, "purchase", 1.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    r = REGISTRY["sketch_kmv_setops"].spark(spark, str(tmp_path)).collect()[0]
    assert (r.n_a_exact, r.n_b_exact, r.n_union_exact, r.n_intersect_exact) \
        == (10, 5, 12, 3)
    # below k the sketch IS the set: estimates equal the exact counts
    assert (r.est_a, r.est_b, r.est_union) == (10.0, 5.0, 12.0)
    assert r.est_intersect == 3.0 and r.rel_err_union == 0.0
