"""Semantic laws for the r5r wave: Neyman stratified allocation."""

from __future__ import annotations

import datetime
import math

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR

B = 10_000


def test_neyman_budget_conserved_and_recompute(spark):
    import duckdb

    out = REGISTRY["sample_neyman_allocation"].spark(spark, SF_DIR).toPandas()
    assert out.alloc_neyman.sum() == B
    src = duckdb.sql(f"""
        SELECT o_orderpriority s, COUNT(*) n,
               SUM(CAST(FLOOR(o_totalprice*100.0+0.5) AS BIGINT) // 100) sx,
               SUM((CAST(FLOOR(o_totalprice*100.0+0.5) AS BIGINT) // 100)
                   * (CAST(FLOOR(o_totalprice*100.0+0.5) AS BIGINT)
                      // 100)) sxx
        FROM '{SF_DIR}/orders.parquet' GROUP BY 1
    """).df()
    wq = {}
    for _, r in src.iterrows():
        var = (r.sxx - r.sx * r.sx / r.n) / (r.n - 1)
        wq[r.s] = math.floor(r.n * math.sqrt(var) * 100.0 + 0.5)
    wtot = sum(wq.values())
    for _, r in out.iterrows():
        assert abs(r.neyman_share - round(wq[r.stratum] / wtot, 6)) < 2e-6
        # hamilton: within one seat of the exact quota
        assert abs(r.alloc_neyman - B * wq[r.stratum] / wtot) < 1.0


def test_neyman_reallocates_toward_variance(spark, tmp_path):
    # stratum A: constant values (sigma=0); stratum B: high spread.
    # Neyman must starve A and feed B; proportional splits by size.
    rows = []
    for i in range(100):
        rows.append((i, 1, "A", 100.0, datetime.date(2024, 1, 1)))
    for i in range(100, 200):
        rows.append((i, 1, "B", 10.0 if i % 2 else 990.0,
                     datetime.date(2024, 1, 1)))
    spark.createDataFrame(
        rows,
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderpriority STRING, "
        "o_totalprice DOUBLE, o_orderdate DATE",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    out = (
        REGISTRY["sample_neyman_allocation"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .set_index("stratum")
    )
    assert out.loc["A", "alloc_neyman"] == 0  # zero variance -> zero sample
    assert out.loc["B", "alloc_neyman"] == B
    assert out.loc["A", "alloc_proportional"] == B // 2
