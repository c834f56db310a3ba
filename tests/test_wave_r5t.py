"""Semantic laws for the r5t wave: multi-locale currency parsing +
incident MTTR/MTBF rollup."""

from __future__ import annotations

import datetime

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# --------------------------------------------------------------------------
# fn_currency_parse
# --------------------------------------------------------------------------


def test_currency_parse_roundtrip_exact_on_real_data(spark):
    out = (
        REGISTRY["fn_currency_parse"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("fmt")
    )
    assert set(out.index) == {
        "us_symbol", "eu_locale", "plain", "accounting_neg",
    }
    # the roundtrip law: every string parses back to its exact cents
    assert (out.n_mismatch == 0).all()
    # accounting format carries the sign flip
    assert out.loc["accounting_neg", "sum_parsed_cents"] < 0
    assert out.loc["us_symbol", "sum_parsed_cents"] > 0


def test_currency_parse_known_values_and_wide_grouping(spark, tmp_path):
    # orderkey % 4 pins each format; 1234567.89 forces the two-separator
    # grouping branch ('1,234,567.89'), 12.05 the no-separator branch.
    rows = [
        (0, 1, "O", 1234567.89, datetime.datetime(2024, 1, 1), "1-A"),
        (1, 1, "O", 1234567.89, datetime.datetime(2024, 1, 1), "1-A"),
        (2, 1, "O", 12.05, datetime.datetime(2024, 1, 1), "1-A"),
        (3, 1, "O", 1234567.89, datetime.datetime(2024, 1, 1), "1-A"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, "
        "o_orderpriority STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    out = (
        REGISTRY["fn_currency_parse"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .set_index("fmt")
    )
    assert (out.n_mismatch == 0).all()
    assert out.loc["us_symbol", "sum_parsed_cents"] == 123456789
    assert out.loc["eu_locale", "sum_parsed_cents"] == 123456789
    assert out.loc["plain", "sum_parsed_cents"] == 1205
    assert out.loc["accounting_neg", "sum_parsed_cents"] == -123456789


# --------------------------------------------------------------------------
# ops_incident_mttr
# --------------------------------------------------------------------------


def test_incident_mttr_hand_computed_scenario(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ts(s):
        return t0 + datetime.timedelta(seconds=s)

    rows = [
        # user 1: error@0 -> ok@10 (ttr 10s); error@100 + error@101 (one
        # run) -> ok@130 (ttr 30s); error@200 never recovers (open)
        (1, ts(0), 1, "error", 0.0, "{}"),
        (2, ts(10), 1, "click", 0.0, "{}"),
        (3, ts(100), 1, "error", 0.0, "{}"),
        (4, ts(101), 1, "error", 0.0, "{}"),
        (5, ts(130), 1, "view", 0.0, "{}"),
        (6, ts(200), 1, "error", 0.0, "{}"),
        # user 2: no errors at all
        (7, ts(5), 2, "click", 0.0, "{}"),
        (8, ts(15), 2, "view", 0.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = (
        REGISTRY["ops_incident_mttr"].spark(spark, str(tmp_path)).toPandas()
    )
    row = out.iloc[0]
    assert row.n_incidents == 3
    assert row.n_recovered == 2
    assert row.n_open == 1
    assert row.mean_ttr_us == (10 + 30) * 1_000_000 // 2
    assert row.max_ttr_us == 30 * 1_000_000
    # incident starts at 0, 100, 200 -> gaps 100s and 100s
    assert row.mean_tbf_us == 100 * 1_000_000
    assert row.mttr_seconds == 20.0


def test_incident_mttr_real_data_invariants(spark):
    out = REGISTRY["ops_incident_mttr"].spark(spark, SF_DIR).toPandas()
    row = out.iloc[0]
    assert row.n_incidents == row.n_recovered + row.n_open
    assert row.n_incidents > 0
    assert 0 < row.mean_ttr_us <= row.max_ttr_us
    # recovery-time mean can never exceed the failure-spacing mean on a
    # stream where non-errors dominate between runs
    assert row.mean_ttr_us < row.mean_tbf_us
