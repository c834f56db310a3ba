"""Semantic laws for the r6s wave: exact Shapley attribution and the
DFT periodogram."""

from __future__ import annotations

import datetime
import itertools
import math

import numpy as np

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR

_CH = ("click", "error", "signup", "view")


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")


# ---------------------------------------------------------------------------
# attribution_shapley
# ---------------------------------------------------------------------------

def _shapley_python(touch_rows):
    """touch_rows: list of (mask, converted). Returns per-channel 24ths
    computed by brute-force PERMUTATION enumeration — a different
    algorithm than the subset-lattice form under test."""
    conv: dict[int, int] = {}
    for m, c in touch_rows:
        conv[m] = conv.get(m, 0) + c

    def v(s):
        return sum(n for m, n in conv.items() if (m & s) == m)

    phi = [0] * 4  # in 24ths
    for perm in itertools.permutations(range(4)):
        s = 0
        for d in perm:
            phi[d] += v(s | (1 << d)) - v(s)
            s |= 1 << d
    return phi  # 24 permutations -> already in 24ths


def test_shapley_matches_permutation_enumeration(spark):
    import duckdb

    rows = duckdb.sql(
        f"""SELECT user_id,
                   {" + ".join(
                       f"MAX(CASE WHEN event_type = '{c}' THEN {1 << d}"
                       " ELSE 0 END)" for d, c in enumerate(_CH))},
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            FROM '{SF_DIR}/events.parquet' GROUP BY user_id"""
    ).fetchall()
    touch = [(m, c) for _, m, c in rows]
    phi = _shapley_python(touch)
    out = (
        REGISTRY["attribution_shapley"].spark(spark, SF_DIR)
        .toPandas().set_index("channel")
    )
    for d, ch in enumerate(_CH):
        assert out.loc[ch, "shapley_24ths"] == phi[d]
        assert abs(
            out.loc[ch, "shapley_conversions"]
            - math.floor(phi[d] / 24 * 1e4 + 0.5) / 1e4
        ) < 1e-12
    # efficiency axiom, exactly in integers
    v_full = sum(c for _, c in touch)
    v_empty = sum(c for m, c in touch if m == 0)
    assert out.shapley_24ths.sum() == 24 * (v_full - v_empty)
    assert (out.attributable_conversions == v_full - v_empty).all()


def test_shapley_dummy_channel_gets_zero(spark, tmp_path):
    """A channel that appears in NO converting journey earns exactly 0
    (the dummy axiom); a channel present in every one earns the most."""
    d0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def user(uid, types):
        nonlocal eid
        for t in types:
            rows.append((eid, d0, uid, t, 1.0, "{}"))
            eid += 1

    for uid in range(10):  # converters: click+view only
        user(uid, ["click", "view", "purchase"])
    user(10, ["error"])            # error touches only a non-converter
    user(11, ["signup", "click"])  # signup never converts either
    _write_events(spark, tmp_path, rows)
    out = (
        REGISTRY["attribution_shapley"].spark(spark, str(tmp_path))
        .toPandas().set_index("channel")
    )
    assert out.loc["error", "shapley_24ths"] == 0
    assert out.loc["signup", "shapley_24ths"] == 0
    assert out.loc["click", "shapley_24ths"] == out.loc[
        "view", "shapley_24ths"
    ]  # symmetry axiom: interchangeable channels earn equally
    assert out.shapley_24ths.sum() == 24 * 10


# ---------------------------------------------------------------------------
# ts_periodogram
# ---------------------------------------------------------------------------

def test_periodogram_planted_weekly_cycle(spark, tmp_path):
    """A pure 7-day cycle over 28 days concentrates power at k = 4
    (period 28/4 = 7 days)."""
    d0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(28):
        n = 20 + round(15 * math.cos(2 * math.pi * d / 7))
        for _ in range(n):
            rows.append((eid, d0 + datetime.timedelta(days=d), eid,
                         "click", 1.0, "{}"))
            eid += 1
    _write_events(spark, tmp_path, rows)
    out = (
        REGISTRY["ts_periodogram"].spark(spark, str(tmp_path))
        .toPandas().set_index("k")
    )
    assert out.loc[4, "is_dominant"] == 1
    assert out.loc[4, "period_days"] == 7.0
    others = out.drop(index=[4])
    # ignore k=0-adjacent DC leakage rows: the cycle row dominates all
    assert (out.loc[4, "power"] > 10 * others[others.index > 1].power).all()


def test_periodogram_matches_numpy(spark):
    import duckdb

    daily = duckdb.sql(
        f"""SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*)
        FROM '{SF_DIR}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    series: dict[str, list] = {}
    for t, _, c in daily:
        series.setdefault(t, []).append(c)
    out = REGISTRY["ts_periodogram"].spark(spark, SF_DIR).toPandas()
    for t, xs in series.items():
        n = len(xs)
        x = np.array(xs, dtype=float)
        sub = out[out.event_type == t].set_index("k")
        for k in sub.index:
            ang = 2 * np.pi * k * np.arange(n) / n
            p = ((x * np.cos(ang)).sum() ** 2
                 + (x * np.sin(ang)).sum() ** 2) / n
            assert abs(sub.loc[k, "power"]
                       - math.floor(p * 100 + 0.5) / 100) < 1e-6
        assert sub.is_dominant.sum() >= 1
