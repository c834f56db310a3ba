"""Semantic laws for the r5y wave: condensation DAG + burn-rate
alerts."""

from __future__ import annotations

import datetime

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# --------------------------------------------------------------------------
# graph_condensation
# --------------------------------------------------------------------------


def test_condensation_is_consistent_with_scc(spark):
    scc = REGISTRY["graph_scc"].spark(spark, SF_DIR).toPandas()
    out = REGISTRY["graph_condensation"].spark(spark, SF_DIR).toPandas()
    # one condensation row per component, sizes conserved
    comp = scc.groupby("scc_id").size()
    assert set(out.scc_id) == set(comp.index)
    for _, r in out.iterrows():
        assert r.scc_size == comp[r.scc_id]
    assert out.scc_size.sum() == 25


def test_condensation_is_a_dag(spark):
    out = (
        REGISTRY["graph_condensation"].spark(spark, SF_DIR).toPandas()
    )
    # a DAG has at least one source and one sink
    assert out.is_source.any()
    assert out.is_sink.any()
    # sources sit at level 0; every non-source sits strictly above
    assert (out[out.is_source].topo_level == 0).all()
    assert (out[~out.is_source].topo_level > 0).all()
    # levels are bounded by the component count (no cycle inflation)
    assert out.topo_level.max() < len(out)
    # degree accounting: sum of out-degrees = sum of in-degrees
    assert out.out_degree.sum() == out.in_degree.sum()


# --------------------------------------------------------------------------
# sli_burn_rate_alerts
# --------------------------------------------------------------------------


def test_burn_rate_dual_window_suppresses_noise(spark):
    out = REGISTRY["sli_burn_rate_alerts"].spark(spark, SF_DIR).toPandas()
    assert len(out) > 500  # hourly grain over the 30-day feed
    # single noisy hours cross the fast threshold far more often than
    # the dual-window policy pages — the suppression property
    fast = (out.burn_1h_ppm >= 2_000_000).sum()
    assert fast > 0
    assert out.page.sum() < fast / 2
    # page implies BOTH windows over threshold (never the 1h alone)
    paged = out[out.page]
    assert (paged.burn_6h_ppm >= 2_000_000).all()
    # burn is exact integer ppm of 4x the error share
    r = out.iloc[10]
    assert r.burn_1h_ppm == 4_000_000 * r.errors // r.total


def test_burn_rate_planted_outage_pages(spark, tmp_path):
    # 6 days of healthy traffic (10% errors), then an 8-hour 100%-error
    # outage: pages must fire during the outage and not before.
    rows, eid = [], 0
    t0 = datetime.datetime(2024, 1, 1)
    for h in range(6 * 24):
        for i in range(10):
            typ = "error" if i == 0 else "click"
            rows.append(
                (eid, t0 + datetime.timedelta(hours=h, minutes=i), 1,
                 typ, 1.0, "{}")
            )
            eid += 1
    for h in range(6 * 24, 6 * 24 + 8):
        for i in range(10):
            rows.append(
                (eid, t0 + datetime.timedelta(hours=h, minutes=i), 1,
                 "error", 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = (
        REGISTRY["sli_burn_rate_alerts"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .sort_values("hour")
        .reset_index(drop=True)
    )
    healthy = out.iloc[: 6 * 24]
    outage = out.iloc[6 * 24:]
    # healthy period: burn = 4 * 0.10 = 0.4 -> no alerts at all
    assert (healthy.burn_1h_ppm == 400_000).all()
    assert not healthy.page.any() and not healthy.ticket.any()
    # outage hours: 1h burn = 4.0 immediately; the 6h confirm crosses
    # 2.0 once >= 3 of the trailing 6 hours are outage hours
    assert (outage.burn_1h_ppm == 4_000_000).all()
    assert outage.page.any()
    assert not outage.page.iloc[0]  # first outage hour: confirm lags
    assert outage.page.iloc[-1]     # fully-burning tail pages
