"""Semantic laws for the r5o wave: blind-key join + ratio metrics."""

from __future__ import annotations

import duckdb

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_blind_join_equals_raw_join(spark):
    out = (
        REGISTRY["join_blind_keys"].spark(spark, SF_DIR).toPandas()
        .set_index("c_mktsegment")
    )
    raw = duckdb.sql(f"""
        SELECT c.c_mktsegment,
               COUNT(*) n,
               SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT)) s
        FROM '{SF_DIR}/customer.parquet' c
        JOIN '{SF_DIR}/orders.parquet' o ON o.o_custkey = c.c_custkey
        GROUP BY 1
    """).df().set_index("c_mktsegment")
    assert set(out.index) == set(raw.index)
    for seg in raw.index:
        assert out.loc[seg, "n_orders"] == raw.loc[seg, "n"]
        assert out.loc[seg, "revenue_cents"] == raw.loc[seg, "s"]
    # md5 over this key space is collision-free and the audit proves it
    assert (out.n_hash_collisions == 0).all()


def test_ratio_metrics_identities(spark):
    out = REGISTRY["agg_ratio_of_sums"].spark(spark, SF_DIR).toPandas()
    # only nations with shipping suppliers appear at tiny SF
    assert 1 <= len(out) <= 25
    # both are plausible unit prices; weighted and unweighted means
    # genuinely differ on this corpus for at least some nations
    assert (out.ratio_of_sums > 0).all()
    assert (out.mean_of_ratios > 0).all()
    assert out.metrics_diverge.sum() > 0
    # the flag is exactly the 4-dp inequality of the two columns
    for _, r in out.iterrows():
        assert r.metrics_diverge == int(
            round(r.ratio_of_sums * 1e4) != round(r.mean_of_ratios * 1e4)
        )


def test_ratio_metrics_agree_on_uniform_prices(spark, tmp_path):
    # constant unit price -> the two definitions coincide exactly
    li = [(i, i % 3 + 1, 2.5 * (i % 3 + 1), float(i % 3 + 1)) for i in range(60)]
    spark.createDataFrame(
        [(k, s, p, q) for k, s, p, q in li],
        "l_orderkey BIGINT, l_suppkey BIGINT, l_extendedprice DOUBLE, "
        "l_quantity DOUBLE",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1)], "s_suppkey BIGINT, s_nationkey BIGINT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/supplier.parquet")
    spark.createDataFrame(
        [(0, "A"), (1, "B")], "n_nationkey BIGINT, n_name STRING"
    ).write.mode("overwrite").parquet(f"{tmp_path}/nation.parquet")
    out = REGISTRY["agg_ratio_of_sums"].spark(spark, str(tmp_path)).toPandas()
    assert (out.metrics_diverge == 0).all()
    # unit price is reported in cents per unit: $2.50 = 250 cents
    assert (out.ratio_of_sums == 250.0).all()
    assert (out.mean_of_ratios == 250.0).all()
