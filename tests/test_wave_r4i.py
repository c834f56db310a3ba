"""Semantic laws for the r4i wave: t-closeness and Hamilton
apportionment."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# ---------------------------------------------------------- t-closeness

def test_tcloseness_fixture_laws(spark):
    out = REGISTRY["privacy_t_closeness"].spark(spark, SF_DIR).collect()
    assert len(out) > 0
    for r in out:
        assert 0.0 <= r.emd <= 1.0
        # the integer verdict must agree with the reported emd at 1/5
        if r.emd < 0.1999:
            assert r.is_t_close
        if r.emd > 0.2001:
            assert not r.is_t_close
    # class sizes sum to the fact count
    orders = load_table(spark, SF_DIR, "orders")
    assert sum(r.n_orders for r in out) == orders.count()


def test_tcloseness_global_class_is_zero(spark):
    """A QI class whose distribution equals the global one has EMD 0 —
    verified by computing one class's EMD by hand from raw counts."""
    out = {(r.nation, r.segment): r for r in
           REGISTRY["privacy_t_closeness"].spark(spark, SF_DIR).collect()}
    f = (
        load_table(spark, SF_DIR, "orders")
        .join(load_table(spark, SF_DIR, "customer"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(load_table(spark, SF_DIR, "nation"),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("nation"),
                F.col("c_mktsegment").alias("segment"),
                F.col("o_orderpriority").alias("p"))
    ).collect()
    from collections import Counter
    total = Counter(r.p for r in f)
    prios = sorted(total)
    n_tot = len(f)
    nation, segment = f[0].nation, f[0].segment
    cls = Counter(r.p for r in f if (r.nation, r.segment) == (nation, segment))
    n_c = sum(cls.values())
    emd, ck, cg = 0, 0, 0
    for p in prios[:-1]:
        ck += cls.get(p, 0)
        cg += total[p]
        emd += abs(ck / n_c - cg / n_tot)
    emd /= len(prios) - 1
    r = out[(nation, segment)]
    assert abs(r.emd - emd) < 1e-5
    assert r.is_t_close == (emd <= 0.2 + 1e-12)


# -------------------------------------------------------- apportionment

def test_apportion_conserves_budget(spark):
    out = REGISTRY["corpus_apportion_budget"].spark(spark, SF_DIR).collect()
    assert sum(r.alloc_tokens for r in out) == 1_000_000  # THE law
    tot = sum(r.tokens for r in out)
    for r in out:
        assert r.alloc_tokens in (r.base_alloc, r.base_alloc + 1)
        # within one unit of the exact real-valued quota
        assert abs(r.alloc_tokens * tot - 1_000_000 * r.tokens) < tot
    assert abs(sum(r.alloc_share for r in out) - 1.0) < 1e-4


def test_apportion_proportionality(spark):
    out = REGISTRY["corpus_apportion_budget"].spark(spark, SF_DIR).collect()
    # bigger sources never get smaller allocations than smaller ones
    by_tokens = sorted(out, key=lambda r: r.tokens)
    for a, b in zip(by_tokens, by_tokens[1:]):
        assert a.alloc_tokens <= b.alloc_tokens + 1  # Hamilton ±1 band
