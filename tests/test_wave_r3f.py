"""Semantic laws for the r3f wave: privacy tier (k-anonymity /
l-diversity / generalization), rank-sum + survival stats, item-CF
recsys, and the mergeable-MinHash source matrix.

Differential equality vs DuckDB is covered registry-wide by
test_differential.py; these tests pin the SEMANTICS with constructed
warehouses where the right answer is known by hand.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _ts(h: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)


def _write(spark, path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{path}/{name}.parquet"
    )


_EVENT_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def _write_geo(spark, path, customers):
    """nation/region dims + the given (custkey, nationkey, segment)."""
    _write(spark, path, "region", [(0, "R0"), (1, "R1")],
           "r_regionkey INT, r_name STRING")
    _write(spark, path, "nation",
           [(0, "N0", 0), (1, "N1", 0), (2, "N2", 1)],
           "n_nationkey INT, n_name STRING, n_regionkey INT")
    _write(spark, path, "customer",
           [(ck, f"c{ck}", nk, 0.0, seg) for ck, nk, seg in customers],
           "c_custkey BIGINT, c_name STRING, c_nationkey INT, "
           "c_acctbal DOUBLE, c_mktsegment STRING")


# ---------------------------------------------------------------- privacy

def test_k_anonymity_flags_small_class(spark, tmp_path):
    # N0/AUTO has 5 customers (k-anon at k=5), N1/AUTO has 2 (not)
    custs = [(i, 0, "AUTO") for i in range(5)] + [(10, 1, "AUTO"), (11, 1, "AUTO")]
    _write_geo(spark, tmp_path, custs)
    out = {
        (r.nation, r.segment): r
        for r in REGISTRY["privacy_k_anonymity"].spark(spark, str(tmp_path)).collect()
    }
    assert out[("N0", "AUTO")].class_n == 5 and out[("N0", "AUTO")].is_k_anon
    assert out[("N1", "AUTO")].class_n == 2 and not out[("N1", "AUTO")].is_k_anon


def test_k_anonymity_census_conserves_customers(spark):
    rows = REGISTRY["privacy_k_anonymity"].spark(spark, SF_DIR).collect()
    total = sum(r.class_n for r in rows)
    n_cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    assert total == n_cust
    for r in rows:
        assert r.is_k_anon == (r.class_n >= 5)


def test_l_diversity_constant_sensitive_value_fails(spark, tmp_path):
    custs = [(i, 0, "AUTO") for i in range(5)] + [(10, 1, "AUTO")]
    _write_geo(spark, tmp_path, custs)
    # N0 customers order with 3 distinct priorities; N1's single
    # customer always 1-URGENT -> l=1, not diverse
    orders = [
        (o, o % 5, "O", 10.0, _ts(0), p)
        for o, p in enumerate(["1-URGENT", "2-HIGH", "3-MEDIUM", "1-URGENT", "2-HIGH"])
    ] + [(100, 10, "O", 10.0, _ts(0), "1-URGENT"),
         (101, 10, "O", 10.0, _ts(0), "1-URGENT")]
    _write(spark, tmp_path, "orders", orders,
           "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
           "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING")
    out = {
        (r.nation, r.segment): r
        for r in REGISTRY["privacy_l_diversity"].spark(spark, str(tmp_path)).collect()
    }
    assert out[("N0", "AUTO")].l_distinct == 3 and out[("N0", "AUTO")].is_l_diverse
    assert out[("N1", "AUTO")].l_distinct == 1 and not out[("N1", "AUTO")].is_l_diverse


def test_generalize_ladder_nation_region_suppressed(spark, tmp_path):
    # N0/AUTO passes at nation level (5); N1/AUTO (2) + N0 together give
    # region R0 size 7 -> N1 generalizes to region; N2/AUTO alone in R1
    # with 1 customer -> suppressed
    custs = ([(i, 0, "AUTO") for i in range(5)]
             + [(10, 1, "AUTO"), (11, 1, "AUTO")]
             + [(20, 2, "AUTO")])
    _write_geo(spark, tmp_path, custs)
    out = {
        r.nation: r
        for r in REGISTRY["privacy_generalize"].spark(spark, str(tmp_path)).collect()
    }
    assert out["N0"].level == "nation" and out["N0"].released_cell == "N0"
    assert out["N0"].cell_n == 5
    assert out["N1"].level == "region" and out["N1"].released_cell == "R0"
    assert out["N1"].cell_n == 7
    assert out["N2"].level == "suppressed" and out["N2"].released_cell == "*"
    assert out["N2"].cell_n == 0


def test_generalize_released_cells_all_meet_k_on_fixture(spark):
    rows = REGISTRY["privacy_generalize"].spark(spark, SF_DIR).collect()
    for r in rows:
        if r.level != "suppressed":
            assert r.cell_n >= 5


# ------------------------------------------------------------ mannwhitney

def _floorround(x: float, n: int) -> float:
    return math.floor(x * 10**n + 0.5) / 10**n


def test_mannwhitney_separated_groups(spark, tmp_path):
    # clicks strictly below views: U1 = 0, rank_biserial = 1
    rows = [(i, _ts(0), 1, "click", v, "{}") for i, v in enumerate([1.0, 2.0, 3.0])]
    rows += [(10 + i, _ts(0), 1, "view", v, "{}") for i, v in enumerate([4.0, 5.0, 6.0])]
    _write(spark, tmp_path, "events", rows, _EVENT_SCHEMA)
    r = REGISTRY["hypothesis_mannwhitney"].spark(spark, str(tmp_path)).collect()[0]
    assert (r.n1, r.n2, r.n_tied_values) == (3, 3, 0)
    assert r.u1 == 0.0
    sigma = math.sqrt(9 / 12 * 7)
    assert r.z_stat == pytest.approx(_floorround(-4.5 / sigma, 4), abs=0)
    assert r.rank_biserial == 1.0


def test_mannwhitney_identical_groups_z_zero(spark, tmp_path):
    vals = [1.0, 2.0, 3.0, 4.0]
    rows = [(i, _ts(0), 1, "click", v, "{}") for i, v in enumerate(vals)]
    rows += [(10 + i, _ts(0), 1, "view", v, "{}") for i, v in enumerate(vals)]
    _write(spark, tmp_path, "events", rows, _EVENT_SCHEMA)
    r = REGISTRY["hypothesis_mannwhitney"].spark(spark, str(tmp_path)).collect()[0]
    # every value tied across groups -> U1 = n1*n2/2 exactly
    assert r.n_tied_values == 4
    assert r.u1 == 8.0
    assert r.z_stat == 0.0 and r.rank_biserial == 0.0


# ------------------------------------------------------------ kaplan-meier

def test_km_hand_computed_curve(spark, tmp_path):
    # u1 purchases in hour 1, u2 in hour 2, u3 never, u4 past horizon
    rows = [
        (1, _ts(0), 1, "signup", 1.0, "{}"),
        (2, _ts(1.03), 1, "purchase", 1.0, "{}"),
        (3, _ts(0), 2, "signup", 1.0, "{}"),
        (4, _ts(2.5), 2, "purchase", 1.0, "{}"),
        (5, _ts(0), 3, "signup", 1.0, "{}"),
        (6, _ts(0), 4, "signup", 1.0, "{}"),
        (7, _ts(100), 4, "purchase", 1.0, "{}"),
    ]
    _write(spark, tmp_path, "events", rows, _EVENT_SCHEMA)
    out = REGISTRY["survival_kaplan_meier"].spark(spark, str(tmp_path)).collect()
    assert [(r.t_hours, r.n_risk, r.n_events, r.s_km) for r in out] == [
        (1, 4, 1, 0.75),
        (2, 3, 1, 0.5),
    ]


def test_km_fixture_laws(spark):
    out = REGISTRY["survival_kaplan_meier"].spark(spark, SF_DIR).collect()
    n_users = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert out, "fixture must produce at least one event time"
    assert out[0].n_risk == n_users  # everyone at risk at the first step
    s_prev = 1.0
    for r in out:
        assert 0.0 <= r.s_km <= s_prev + 1e-12  # monotone non-increasing
        assert r.n_events >= 1
        s_prev = r.s_km


# ----------------------------------------------------------------- recsys

def test_item_knn_identical_customer_sets_rank_first(spark, tmp_path):
    # brands A and B bought by the same two customers -> cosine 1.0;
    # C bought by one of them -> cos(A,C) = 1/sqrt(2)
    _write(spark, tmp_path, "part",
           [(1, "pA", "BRAND#A", "t", 1, 1.0), (2, "pB", "BRAND#B", "t", 1, 1.0),
            (3, "pC", "BRAND#C", "t", 1, 1.0)],
           "p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING, "
           "p_size INT, p_retailprice DOUBLE")
    _write(spark, tmp_path, "orders",
           [(o, c, "O", 1.0, _ts(0), "1-URGENT")
            for o, c in [(1, 1), (2, 2)]],
           "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
           "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING")
    li = [(1, 1, 1, 1), (1, 2, 1, 2), (1, 3, 1, 3),  # cust1: A, B, C
          (2, 1, 1, 1), (2, 2, 1, 2)]                # cust2: A, B
    _write(spark, tmp_path, "lineitem",
           [(o, p, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O", _ts(1))
            for o, p, _, ln in li],
           "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, "
           "l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, "
           "l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING, "
           "l_linestatus STRING, l_shipdate TIMESTAMP")
    out = REGISTRY["recsys_item_knn"].spark(spark, str(tmp_path)).collect()
    top = {r.item: r for r in out if r.rnk == 1}
    assert top["BRAND#A"].neighbor == "BRAND#B" and top["BRAND#A"].cosine == 1.0
    assert top["BRAND#B"].neighbor == "BRAND#A" and top["BRAND#B"].cosine == 1.0
    assert top["BRAND#C"].cosine == pytest.approx(
        _floorround(1 / math.sqrt(2), 6), abs=0
    )


def test_item_knn_fixture_laws(spark):
    out = REGISTRY["recsys_item_knn"].spark(spark, SF_DIR).collect()
    by_item: dict[str, list] = {}
    for r in out:
        assert 0.0 < r.cosine <= 1.0
        assert r.neighbor != r.item
        by_item.setdefault(r.item, []).append(r)
    for item, rows in by_item.items():
        ranks = sorted(r.rnk for r in rows)
        assert ranks == list(range(1, len(ranks) + 1)) and len(ranks) <= 5
        ordered = sorted(rows, key=lambda r: r.rnk)
        for lo, hi in zip(ordered, ordered[1:]):
            assert lo.cosine >= hi.cosine  # rank follows cosine


# ---------------------------------------------------------- minhash union

def test_minhash_union_merge_equals_direct_source_signature(spark):
    """Mergeability: min-merging per-doc signatures equals computing the
    signature directly on the source's unioned shingle set."""
    from gcp_de_data_pipeline_cc_spark.operators import dedup as dd

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    merged = (
        dd.minhash_signatures(docs, num_perms=8, k=3)
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(*[F.min(f"sig_{i}").alias(f"sig_{i}") for i in range(8)])
    )
    direct = dd.minhash_signatures(
        docs.select(F.col("source").alias("src_id"), "text"),
        num_perms=8, k=3, id_col="src_id",
    )
    m = {r.source: r for r in merged.collect()}
    d = {r.src_id: r for r in direct.collect()}
    assert set(m) == set(d)
    for s in m:
        for i in range(8):
            assert m[s][f"sig_{i}"] == d[s][f"sig_{i}"], (s, i)


def test_minhash_union_duplicated_source_estimates_one(spark, tmp_path):
    docs = [(i, f"tok{i} tok{i+1} tok{i+2} tok{i+3} alpha beta", "en",
             "srcA", 30) for i in range(6)]
    clone = [(100 + i, t, l, "srcB", n) for i, t, l, _, n in docs]
    other = [(200 + i, f"zeta eta theta iota kappa word{i}", "en", "srcC", 28)
             for i in range(6)]
    _write(spark, tmp_path, "documents", docs + clone + other,
           "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
    out = {
        (r.src_a, r.src_b): r
        for r in REGISTRY["sketch_minhash_union"].spark(spark, str(tmp_path)).collect()
    }
    ab = out[("srcA", "srcB")]
    assert ab.est_jaccard == 1.0 and ab.exact_jaccard == 1.0 and ab.abs_err == 0.0
    # disjoint vocab -> exact 0; the 16-perm estimate stays low
    assert out[("srcA", "srcC")].exact_jaccard == 0.0


def test_minhash_union_estimator_error_bounded_on_fixture(spark):
    out = REGISTRY["sketch_minhash_union"].spark(spark, SF_DIR).collect()
    n_src = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("source").distinct().count()
    )
    assert len(out) == n_src * (n_src - 1) // 2  # every pair reported
    for r in out:
        assert r.est_jaccard in [i / 16 for i in range(17)]
        assert abs(r.est_jaccard - r.exact_jaccard) <= r.abs_err + 1e-9
    # 16 components: mean |err| should stay well under half the grid
    mean_err = sum(r.abs_err for r in out) / len(out)
    assert mean_err <= 0.25
