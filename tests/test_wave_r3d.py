"""Semantic tests for time-series wave 3 (plans/timeseries3.py) and
hypothesis_ttest (plans/stats.py): changepoint localization on an
injected shift, Bollinger band collapse/breakout laws, row-stochastic
transition matrix, and the null-effect t-test.

Value correctness is covered by the auto-parametrized differential
suite; these pin the operator *properties* on constructed series where
the right answer is known by design.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _write_events(spark, path: str, rows):
    """Land synthetic rows under the events schema the plans read."""
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    )
    df.write.mode("overwrite").parquet(f"{path}/events.parquet")


def _day(i: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=i, hours=12)


def test_cusum_localizes_injected_mean_shift(spark, tmp_path):
    """A series flat at 10.0 for 20 days then flat at 50.0 must peak its
    CUSUM exactly at the last pre-shift day."""
    rows = [
        (i, _day(i), 1, "shift", 10.0 if i < 20 else 50.0, "{}")
        for i in range(40)
    ]
    _write_events(spark, str(tmp_path), rows)
    out = REGISTRY["ts_cusum"].spark(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.changepoint_day.date() == _day(19).date()
    assert r.cusum_stat > 0
    # pre-shift mean below series mean -> the peak deviation is negative
    assert r.s_scaled < 0


def test_cusum_matches_independent_recomputation(spark):
    """Fixture check: the scaled statistic equals a driver-side exact
    recomputation from the daily totals."""
    out = {
        r.event_type: r
        for r in REGISTRY["ts_cusum"].spark(spark, SF_DIR).collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    daily = (
        ev.groupBy(
            "event_type", F.date_trunc("day", "ts").alias("day")
        )
        .agg(
            F.sum(
                F.floor(F.col("value") * 100.0 + 0.5).cast("long")
            ).alias("cents")
        )
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day, r.cents))
    for et, pts in series.items():
        pts.sort()
        n = len(pts)
        total = sum(c for _, c in pts)
        prefix, best = 0, None
        for k, (day, c) in enumerate(pts, start=1):
            prefix += c
            s = n * prefix - k * total
            if best is None or abs(s) > abs(best[1]):
                best = (day, s)
        assert out[et].s_scaled == best[1], et
        assert out[et].changepoint_day == best[0], et


def test_bollinger_flat_series_has_no_breakouts(spark, tmp_path):
    """Constant value -> sd 0, bands equal the mid, nothing breaks out;
    and rows only appear once the 7-day window fills."""
    rows = [(i, _day(i), 1, "flat", 25.0, "{}") for i in range(15)]
    _write_events(spark, str(tmp_path), rows)
    out = REGISTRY["ts_bollinger"].spark(spark, str(tmp_path)).collect()
    assert len(out) == 15 - 6  # first 6 days lack a full window
    for r in out:
        assert r.band_upper == r.band_lower == r.band_mid == 25.0
        assert not r.is_breakout


def test_bollinger_spike_breaks_out_once(spark, tmp_path):
    """A single large spike on a steady-but-noisy baseline must flag
    exactly the spike day (a noiseless baseline would put sd=0 windows
    AFTER the spike too, where any jitter breaks out vacuously)."""
    base = [10.0, 10.2, 9.8, 10.1, 9.9, 10.3, 9.7]
    rows = [
        (i, _day(i), 1, "spiky", 500.0 if i == 10 else base[i % 7], "{}")
        for i in range(21)
    ]
    _write_events(spark, str(tmp_path), rows)
    out = REGISTRY["ts_bollinger"].spark(spark, str(tmp_path)).collect()
    breaks = [r.day.date() for r in out if r.is_breakout]
    assert breaks == [_day(10).date()]


def test_markov_matrix_is_row_stochastic(spark):
    rows = REGISTRY["markov_transitions"].spark(spark, SF_DIR).collect()
    assert rows
    from collections import defaultdict

    per_prev = defaultdict(lambda: [0, 0.0, None])
    for r in rows:
        acc = per_prev[r.prev_type]
        acc[0] += r.n_trans
        acc[1] += r.p
        assert acc[2] is None or acc[2] == r.n_from
        acc[2] = r.n_from
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    total_trans = sum(acc[0] for acc in per_prev.values())
    # each user's journey of length L contributes L-1 transitions
    assert total_trans == n_events - n_users
    for prev, (n_sum, p_sum, n_from) in per_prev.items():
        assert n_sum == n_from, prev
        # probabilities rounded to 1e-6, <=5 terms per row
        assert abs(p_sum - 1.0) < 5e-6, (prev, p_sum)


def test_ttest_null_effect_on_identical_groups(spark, tmp_path):
    """click and view carrying the SAME value multiset must score
    mean_diff 0, t 0, and pooled-shape df (n1+n2-2 for equal groups)."""
    vals = [3.0, 7.0, 11.0, 5.0, 9.0, 13.0, 2.0, 8.0]
    rows = []
    for i, v in enumerate(vals):
        rows.append((2 * i, _day(i), 1, "click", v, "{}"))
        rows.append((2 * i + 1, _day(i), 2, "view", v, "{}"))
    _write_events(spark, str(tmp_path), rows)
    r = REGISTRY["hypothesis_ttest"].spark(spark, str(tmp_path)).first()
    assert (r.n1, r.n2) == (len(vals), len(vals))
    assert r.mean_diff == 0.0
    assert r.t_stat == 0.0
    assert abs(r.df_welch - (len(vals) * 2 - 2)) < 0.01


def test_ttest_fixture_shape(spark):
    r = REGISTRY["hypothesis_ttest"].spark(spark, SF_DIR).first()
    assert r.n1 > 1 and r.n2 > 1
    # Welch df is bracketed by min(n)-1 and n1+n2-2
    assert min(r.n1, r.n2) - 1 <= r.df_welch <= r.n1 + r.n2 - 2
    # t and the mean difference must agree in sign
    assert (r.t_stat >= 0) == (r.mean_diff >= 0)


# ---- SQL-surface wave 8 + attribution ----


def test_business_day_closed_form_matches_brute_force():
    """Validate the 5*floor(u/7)+min(u%7,5) closed form against a
    brute-force Mon-Fri count, independently of both engines — the
    differential suite only proves Spark and DuckDB run the SAME
    formula, not that the formula is right."""
    epoch = dt.date(1994, 12, 26)  # Monday

    def f(d: dt.date) -> int:
        u = (d - epoch).days
        return 5 * (u // 7) + min(u % 7, 5)

    def brute(d1: dt.date, d2: dt.date) -> int:
        # business days in [d1, d2): count Mon-Fri dates from d1,
        # excluding d2 — the convention f(d2)-f(d1) implements
        n, d = 0, d1
        while d < d2:
            if d.weekday() < 5:
                n += 1
            d += dt.timedelta(days=1)
        return n

    base = dt.date(1995, 1, 1)
    for i in range(0, 30):
        for j in range(i, i + 40):
            d1 = base + dt.timedelta(days=i)
            d2 = base + dt.timedelta(days=j)
            assert f(d2) - f(d1) == brute(d1, d2), (d1, d2)


def test_datetime_tz_roundtrip_and_day_roll_law(spark):
    out = REGISTRY["fn_datetime_tz"].spark(spark, SF_DIR).cache()
    try:
        assert out.filter(~F.col("roundtrip_ok")).count() == 0
        # +05:30 rolls the calendar day exactly when UTC time >= 18:30
        law = (
            F.hour("ts") * 60 + F.minute("ts") >= 18 * 60 + 30
        )
        assert out.filter(F.col("day_rolled") != law).count() == 0
        assert 0 < out.filter("day_rolled").count() < out.count()
    finally:
        out.unpersist()


def test_attribution_conserves_purchases_and_credits_correctly(
    spark, tmp_path
):
    rows = [
        # user 1: view -> click -> purchase -> purchase (both to click)
        (1, _day(0), 1, "view", 1.0, "{}"),
        (2, _day(1), 1, "click", 1.0, "{}"),
        (3, _day(2), 1, "purchase", 10.0, "{}"),
        (4, _day(3), 1, "purchase", 20.0, "{}"),
        # user 2: purchase with no prior touch -> direct
        (5, _day(0), 2, "purchase", 5.0, "{}"),
        # user 3: error then purchase -> error channel
        (6, _day(0), 3, "error", 1.0, "{}"),
        (7, _day(1), 3, "purchase", 7.0, "{}"),
    ]
    _write_events(spark, str(tmp_path), rows)
    out = {
        r.channel: r
        for r in REGISTRY["attribution_last_touch"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert set(out) == {"click", "direct", "error"}
    assert out["click"].n_purchases == 2
    assert out["click"].revenue_cents == 3000
    assert out["direct"].n_purchases == 1
    assert out["direct"].revenue_cents == 500
    assert out["error"].n_purchases == 1
    assert abs(sum(r.share for r in out.values()) - 1.0) < 1e-5


def test_attribution_fixture_conservation(spark):
    out = REGISTRY["attribution_last_touch"].spark(spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    purchases = ev.filter(F.col("event_type") == "purchase")
    assert sum(r.n_purchases for r in out) == purchases.count()
    total_cents = purchases.select(
        F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long")).alias("c")
    ).first().c
    assert sum(r.revenue_cents for r in out) == total_cents
