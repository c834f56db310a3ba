"""Semantic laws for the r6u wave: Brown-Forsythe homogeneity and the
mean triple."""

from __future__ import annotations

import datetime
import math

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")


# ---------------------------------------------------------------------------
# stats_levene_bf
# ---------------------------------------------------------------------------

def _bf_python(groups):
    """groups: dow -> list of cents. Replicates the exact pipeline."""
    zs = {}
    for dow, xs in groups.items():
        xs = sorted(xs)
        n = len(xs)
        if n % 2:
            med2 = 2 * xs[n // 2]
        else:
            med2 = xs[n // 2 - 1] + xs[n // 2]
        zs[dow] = [abs(2 * x - med2) for x in xs]
    nn = sum(len(v) for v in zs.values())
    k = len(zs)
    st = sum(sum(v) for v in zs.values())
    s2t = sum(sum(w * w for w in v) for v in zs.values())
    sq = sum(
        math.floor(sum(v) ** 2 / len(v) / 1e4 + 0.5) for v in zs.values()
    ) * 1e4
    between = (sq - st * st / nn) / (k - 1)
    within = max(s2t - sq, 0.0) / (nn - k)
    return nn, k, between / within if within else None


def test_levene_matches_python(spark):
    import duckdb

    daily = duckdb.sql(
        f"""SELECT CAST(ts AS DATE) AS day,
                   SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT))
            FROM '{SF_DIR}/events.parquet' GROUP BY 1"""
    ).fetchall()
    groups: dict[int, list] = {}
    for day, cents in daily:
        groups.setdefault(day.isoweekday() % 7 + 1, []).append(cents)
    nn, k, f = _bf_python(groups)
    out = REGISTRY["stats_levene_bf"].spark(spark, SF_DIR).toPandas()
    r = out.iloc[0]
    assert (r.n_days, r.n_groups) == (nn, k)
    assert abs(r.f_bf - math.floor(f * 1e4 + 0.5) / 1e4) < 1e-9
    assert r.reject_05 == (f > 2.099070)


def test_levene_detects_heteroscedastic_groups(spark, tmp_path):
    """Two weekday groups with wildly different spread: BF rejects.
    All days are Mondays or Tuesdays across weeks; Mondays constant,
    Tuesdays alternate tiny/huge."""
    d0 = datetime.datetime(2024, 1, 1)  # a Monday
    rows = []
    eid = 0
    for wk in range(8):
        mon = d0 + datetime.timedelta(weeks=wk)
        tue = mon + datetime.timedelta(days=1)
        for _ in range(10):  # Monday: constant volume 10
            rows.append((eid, mon, eid, "click", 1.0, "{}"))
            eid += 1
        n_tue = (1, 10, 40, 25)[wk % 4]  # Tuesday: wild spread
        for _ in range(n_tue):
            rows.append((eid, tue, eid, "click", 1.0, "{}"))
            eid += 1
    _write_events(spark, tmp_path, rows)
    out = REGISTRY["stats_levene_bf"].spark(spark, str(tmp_path)).toPandas()
    assert bool(out.iloc[0].reject_05)
    assert out.iloc[0].f_bf > 2.099070


# ---------------------------------------------------------------------------
# agg_mean_inequality
# ---------------------------------------------------------------------------

def test_mean_triple_inequality_and_python(spark):
    import duckdb

    rows = duckdb.sql(
        f"""SELECT o_orderpriority,
                   CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)
            FROM '{SF_DIR}/orders.parquet'"""
    ).fetchall()
    groups: dict[str, list] = {}
    for p, c in rows:
        groups.setdefault(p, []).append(c)
    out = (
        REGISTRY["agg_mean_inequality"].spark(spark, SF_DIR)
        .toPandas().set_index("o_orderpriority")
    )
    for p, cs in groups.items():
        n = len(cs)
        am = math.floor(sum(cs) / n / 100 * 100 + 0.5) / 100
        sl = sum(math.floor(math.log(c) * 1e9 + 0.5) for c in cs)
        gm = math.floor(math.exp(sl / n / 1e9) / 100 * 100 + 0.5) / 100
        sr = sum(math.floor(1e15 / c + 0.5) for c in cs)
        hm = math.floor(n / (sr / 1e15) / 100 * 100 + 0.5) / 100
        r = out.loc[p]
        assert r.n == n
        assert abs(r.mean_arith - am) < 1e-9
        assert abs(r.mean_geom - gm) < 1e-9
        assert abs(r.mean_harm - hm) < 1e-9
        # the AM >= GM >= HM law (strict on non-constant data)
        assert r.mean_arith >= r.mean_geom >= r.mean_harm
        assert r.mean_arith > r.mean_harm
