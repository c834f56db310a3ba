"""Semantic laws for the r5m wave: config-driven QC + optimizer hints."""

from __future__ import annotations

import json

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_qc_config_rules_all_pass_on_clean_warehouse(spark):
    out = (
        REGISTRY["qc_config_rules"].spark(spark, SF_DIR).toPandas()
        .set_index("rule_id")
    )
    assert list(out.index) == [f"r{i}" for i in range(1, 8)]
    assert (out.passed == 1).all()
    assert (out.n_violations == 0).all()


def test_qc_config_rules_second_config_and_violations(spark, tmp_path):
    # a different config over planted-dirty data: the runner is generic,
    # not hardwired to the checked-in suite
    cfg = {
        "suite_id": "t",
        "rules": [
            {"id": "a1", "table": "orders", "rule": "min_rows",
             "threshold": 100},
            {"id": "a2", "table": "orders", "rule": "unique",
             "column": "o_orderkey"},
            {"id": "a3", "table": "orders", "rule": "accepted_values",
             "column": "o_orderstatus", "values": ["F"]},
        ],
    }
    cfg_path = tmp_path / "rules.json"
    cfg_path.write_text(json.dumps(cfg))
    rows = [
        (1, 1, "F", 10.0),
        (1, 2, "F", 11.0),  # dup key
        (3, 3, "O", 12.0),  # bad status
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")

    from gcp_de_data_pipeline_cc_spark.plans import curation

    orig = curation._QC_RULES_PATH
    try:
        curation._QC_RULES_PATH = str(cfg_path)
        out = (
            REGISTRY["qc_config_rules"]
            .spark(spark, str(tmp_path))
            .toPandas()
            .set_index("rule_id")
        )
    finally:
        curation._QC_RULES_PATH = orig
    assert out.loc["a1", "passed"] == 0  # only 3 rows < 100
    assert out.loc["a2", "n_violations"] == 1  # one extra copy of key 1
    assert out.loc["a3", "n_violations"] == 1  # the 'O' row


def test_hints_change_plan_not_result(spark):
    import re

    from pyspark.sql import functions as F

    out = REGISTRY["sql_hints"].spark(spark, SF_DIR)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the MERGE hint on the identical query flips the join strategy —
    # same rows either way
    merged = spark.sql("""
        SELECT /*+ MERGE(n) */
               n.n_name,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(FLOOR(c.c_acctbal * 100.0D + 0.5D) AS BIGINT))
                    AS BIGINT) AS bal_cents
        FROM customer_h c JOIN nation_h n
          ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        ORDER BY n.n_name
    """)
    mplan = merged._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in mplan
    a = out.toPandas().reset_index(drop=True)
    b = merged.toPandas().reset_index(drop=True)
    assert a.equals(b)
