"""Semantic laws for the r5f wave: residual anomaly gate + SCD6."""

from __future__ import annotations

import datetime

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# --------------------------------------------------------------------------
# ts_anomaly_stl_residual
# --------------------------------------------------------------------------


def test_residual_gate_ignores_planted_seasonality(spark, tmp_path):
    # strong weekly pattern + one genuine mid-week spike: the raw series
    # would flag every 7th day; the residual gate must flag ONLY the
    # planted anomaly
    rows = []
    day0 = datetime.datetime(2024, 1, 1, 12, 0, 0)  # a Monday
    eid = 0
    for i in range(56):
        val = 500.0 if i % 7 == 0 else 100.0
        if i == 31:  # planted: a non-seasonal burst
            val += 900.0
        eid += 1
        rows.append((eid, 1, "view", day0 + datetime.timedelta(days=i), val, "s"))
    spark.createDataFrame(
        rows,
        "event_id BIGINT, user_id BIGINT, event_type STRING, "
        "ts TIMESTAMP, value DOUBLE, session_id STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = (
        REGISTRY["ts_anomaly_stl_residual"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    flagged = out[out.is_anomaly == 1]
    planted_day = (day0 + datetime.timedelta(days=31)).date()
    assert planted_day in set(flagged.day)
    # the periodic spike days themselves are NOT flagged (seasonality
    # was removed); allow the planted burst's MA neighborhood to ring
    spike_days = {
        (day0 + datetime.timedelta(days=i)).date()
        for i in range(56)
        if i % 7 == 0 and abs(i - 31) > 3
    }
    assert not (set(flagged.day) & spike_days)


def test_residual_gate_sf_identities(spark):
    out = REGISTRY["ts_anomaly_stl_residual"].spark(spark, SF_DIR).toPandas()
    # residual decomposition drops the 3-day edges on each side
    assert len(out) > 0
    assert out.med.nunique() == 1 and out.mad.nunique() == 1
    # gate arithmetic recheck
    med, mad = out.med.iloc[0], out.mad.iloc[0]
    for _, r in out.iterrows():
        if mad > 0:
            expect = int(abs(0.6745 * (r.residual - med) / mad) > 3.5)
        else:
            expect = int(r.residual != med)
        assert r.is_anomaly == expect


# --------------------------------------------------------------------------
# scd6_merge
# --------------------------------------------------------------------------


def test_scd6_structure(spark):
    out = REGISTRY["scd6_merge"].spark(spark, SF_DIR).toPandas()
    # exactly one current row per key
    cur = out[out.is_current]
    assert cur.cust_id.is_unique
    # changed keys have exactly two versions; version-1 history rows
    # carry the TYPE-1 overwritten current value and no prev column
    two = out.groupby("cust_id").size()
    changed_keys = set(two[two == 2].index)
    for k in list(changed_keys)[:20]:
        rows = out[out.cust_id == k].sort_values("version")
        h, c = rows.iloc[0], rows.iloc[1]
        assert not h.is_current and c.is_current
        assert h.current_acct_cents == c.acct_cents  # type-1 column
        assert c.prev_acct_cents == h.acct_cents  # type-3 column
    # unchanged / insert keys: single current row, prev is null
    singles = out[~out.cust_id.isin(changed_keys) & out.is_current]
    assert singles.prev_acct_cents.isna().all()
    # every row's current_acct_cents equals its key's current version's
    # acct_cents (the SCD1 guarantee)
    cur_map = cur.set_index("cust_id").acct_cents
    with_cur = out[out.cust_id.isin(cur_map.index)]
    assert (
        with_cur.current_acct_cents.values
        == cur_map.loc[with_cur.cust_id].values
    ).all()


def test_scd6_agrees_with_scd3_on_prev(spark):
    scd6 = REGISTRY["scd6_merge"].spark(spark, SF_DIR).toPandas()
    scd3 = REGISTRY["scd3_merge"].spark(spark, SF_DIR).toPandas()
    cur6 = scd6[scd6.is_current].set_index("cust_id")
    upd3 = scd3[scd3.change_type == "update"].set_index("cust_id")
    # the SCD3 previous column and SCD6's current-row prev column agree
    for k in list(upd3.index)[:50]:
        assert cur6.loc[k, "prev_acct_cents"] == upd3.loc[k, "prev_acct_cents"]
