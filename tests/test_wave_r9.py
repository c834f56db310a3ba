"""Law tests for the round-9 wave keys (beyond the registry-wide
DuckDB differential): planted fixtures with hand-computable answers,
independent reimplementations, and structural invariants."""

from __future__ import annotations

import hashlib
import math

import pytest

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _orders(spark, path, rows, priority=None):
    from pyspark.sql import functions as F

    data = [
        (k, float(p), d, (priority[i] if priority else "3-MEDIUM"))
        for i, (k, p, d) in enumerate(rows)
    ]
    (
        spark.createDataFrame(
            data,
            "o_orderkey BIGINT, o_totalprice DOUBLE, o_orderdate STRING,"
            " o_orderpriority STRING",
        )
        .withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
        .write.mode("overwrite")
        .parquet(f"{path}/orders.parquet")
    )


def _lineitem(spark, path, rows):
    """rows: (l_orderkey, l_partkey, l_suppkey, l_quantity)."""
    spark.createDataFrame(
        [(ok, pk, sk, float(q)) for ok, pk, sk, q in rows],
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT,"
        " l_quantity DOUBLE",
    ).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")


def _events(spark, path, rows):
    """rows: (event_id, user_id, event_type, ts 'YYYY-MM-DD HH:MM:SS',
    value)."""
    from pyspark.sql import functions as F

    (
        spark.createDataFrame(
            [(e, u, t, ts, float(v)) for e, u, t, ts, v in rows],
            "event_id BIGINT, user_id BIGINT, event_type STRING,"
            " ts STRING, value DOUBLE",
        )
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .write.mode("overwrite")
        .parquet(f"{path}/events.parquet")
    )


def _docs(spark, path, texts):
    spark.createDataFrame(
        [
            (i, t, "en", f"src{i % 3}", len(t))
            for i, t in enumerate(texts)
        ],
        "doc_id BIGINT, text STRING, lang STRING, source STRING,"
        " n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _parts(spark, path, rows):
    """rows: (p_partkey, p_name, p_brand, p_size)."""
    spark.createDataFrame(
        [(k, n, b, s) for k, n, b, s in rows],
        "p_partkey BIGINT, p_name STRING, p_brand STRING, p_size INT",
    ).write.mode("overwrite").parquet(f"{path}/part.parquet")


# ---------------------------------------------------------------------------
# EDF battery (AD / CvM) — independent python reimplementation
# ---------------------------------------------------------------------------


def _u48(orderkey: int) -> float:
    h = hashlib.md5(f"k:{orderkey}".encode()).hexdigest()[:12]
    return (int(h, 16) + 0.5) / 281474976710656.0


def test_anderson_darling_matches_python_reimplementation(spark, tmp_path):
    keys = list(range(1, 201))
    _orders(spark, tmp_path, [(k, 100.0, "1995-01-01") for k in keys])
    us = sorted(_u48(k) for k in keys)
    n = len(us)
    sq = sum(
        math.floor(
            (
                (2.0 * i - 1.0) * math.log(u)
                + (2.0 * (n - i) + 1.0) * math.log(1.0 - u)
            )
            * 1.0e6
            + 0.5
        )
        for i, u in enumerate(us, start=1)
    )
    want = math.floor((0.0 - n - (sq / 1.0e6) / n) * 1e6 + 0.5) / 1e6
    out = (
        REGISTRY["stats_anderson_darling"].spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert out.n == n
    assert out.a2_stat == pytest.approx(want, abs=0)


def test_cvm_matches_python_reimplementation(spark, tmp_path):
    keys = list(range(1, 151))
    _orders(spark, tmp_path, [(k, 100.0, "1995-01-01") for k in keys])
    us = sorted(_u48(k) for k in keys)
    n = len(us)
    sq = sum(
        math.floor(
            (u - (2.0 * i - 1.0) / (2.0 * n)) ** 2 * 1.0e9 + 0.5
        )
        for i, u in enumerate(us, start=1)
    )
    want = math.floor((1.0 / (12.0 * n) + sq / 1.0e9) * 1e6 + 0.5) / 1e6
    out = (
        REGISTRY["stats_cramer_von_mises"].spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert out.w2_stat == pytest.approx(want, abs=0)


def test_edf_battery_does_not_reject_real_draw(spark):
    """The hash-quality LAW: the portable md5 draw passes all three
    EDF tests at sf0.001 (KS already green; AD adds the tails, CvM
    the integrated gap)."""
    ad = REGISTRY["stats_anderson_darling"].spark(spark, SF_DIR).collect()[0]
    cvm = REGISTRY["stats_cramer_von_mises"].spark(spark, SF_DIR).collect()[0]
    assert not ad.reject_05
    assert not cvm.reject_05


# ---------------------------------------------------------------------------
# stats_gtest
# ---------------------------------------------------------------------------


def test_gtest_zero_under_exact_independence(spark, tmp_path):
    """Counts that factorize exactly (every cell = row share x col
    share) give G = 0."""
    rows = []
    eid = 0
    for h, hcnt in ((0, 2), (1, 4)):
        for et, tcnt in (("click", 1), ("view", 3)):
            for _ in range(hcnt * tcnt):
                rows.append(
                    (eid, eid % 5, et, f"2024-01-01 {h:02d}:30:00", 1.0)
                )
                eid += 1
    _events(spark, tmp_path, rows)
    out = REGISTRY["stats_gtest"].spark(spark, str(tmp_path)).collect()[0]
    assert out.g_stat == 0.0
    assert out.df == 1


# ---------------------------------------------------------------------------
# stats_jonckheere
# ---------------------------------------------------------------------------


def test_jonckheere_saturates_under_perfect_trend(spark, tmp_path):
    """Quantities strictly increasing with priority ⇒ J = Σ_{g<h}
    n_g·n_h (every cross-group pair concordant), z > 0."""
    pri = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    orders, lines = [], []
    n_per = 4
    ok = 0
    for gi, p in enumerate(pri):
        for j in range(n_per):
            ok += 1
            orders.append((ok, 100.0, "1995-06-01"))
            lines.append((ok, 1, 1, 10 * (gi + 1) + j))
    _orders(
        spark,
        tmp_path,
        orders,
        priority=[p for gi, p in enumerate(pri) for _ in range(n_per)],
    )
    _lineitem(spark, tmp_path, lines)
    out = REGISTRY["stats_jonckheere"].spark(spark, str(tmp_path)).collect()[0]
    k = len(pri)
    want_j = n_per * n_per * k * (k - 1) // 2
    assert out.j_stat == float(want_j)
    assert out.z > 0


# ---------------------------------------------------------------------------
# stats_brunner_munzel + stats_cliffs_delta
# ---------------------------------------------------------------------------


def test_bm_symmetric_groups_give_half(spark, tmp_path):
    """Identical de/en length distributions ⇒ p̂ = 0.5, W = 0."""
    texts = []
    langs = []
    for ln in ("de", "en"):
        for length in (10, 20, 30, 40, 50, 60):
            texts.append("x" * length)
            langs.append(ln)
    rows = [
        (i, t, langs[i], "src0", len(t)) for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING,"
        " n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = (
        REGISTRY["stats_brunner_munzel"].spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert out.p_hat == pytest.approx(0.5, abs=0)
    assert out.w_bm == pytest.approx(0.0, abs=0)
    cd = (
        REGISTRY["stats_cliffs_delta"].spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert cd.cliffs_delta == 0.0
    assert cd.magnitude == "negligible"


def test_cliffs_delta_complete_dominance(spark, tmp_path):
    """Every en doc longer than every de doc ⇒ δ = −1 (group1 = de
    dominated), magnitude large."""
    rows = [(i, "x" * (10 + i), "de", "s", 10 + i) for i in range(5)] + [
        (10 + i, "y" * (100 + i), "en", "s", 100 + i) for i in range(5)
    ]
    spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING,"
        " n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    cd = (
        REGISTRY["stats_cliffs_delta"].spark(spark, str(tmp_path))
        .collect()[0]
    )
    assert cd.cliffs_delta == -1.0
    assert cd.magnitude == "large"


# ---------------------------------------------------------------------------
# ts laws (planted day series)
# ---------------------------------------------------------------------------


def _day_orders(vals, start_day=1):
    """One order per day with the given total prices, Jan 1995 on."""
    import datetime

    base = datetime.date(1995, 1, 1)
    return [
        (i + 1, v, str(base + datetime.timedelta(days=i)))
        for i, v in enumerate(vals)
    ]


def test_turning_points_monotone_and_alternating(spark, tmp_path):
    _orders(spark, tmp_path, _day_orders([float(10 * (i + 1)) for i in range(30)]))
    out = REGISTRY["ts_turning_points"].spark(spark, str(tmp_path)).collect()[0]
    assert out.n_turning == 0
    assert out.z < 0
    alt = [100.0 if i % 2 == 0 else 200.0 for i in range(30)]
    _orders(spark, tmp_path, _day_orders(alt))
    out2 = REGISTRY["ts_turning_points"].spark(spark, str(tmp_path)).collect()[0]
    assert out2.n_turning == 28
    assert out2.z > 0


def test_bartels_rank_detects_alternation_and_trend(spark, tmp_path):
    alt = [100.0 + (50.0 if i % 2 == 0 else 0.0) + i * 0.01 for i in range(40)]
    _orders(spark, tmp_path, _day_orders(alt))
    out = REGISTRY["ts_bartels_rank"].spark(spark, str(tmp_path)).collect()[0]
    assert out.rvn > 2.0 and out.z > 0
    trend = [100.0 + 10.0 * i for i in range(40)]
    _orders(spark, tmp_path, _day_orders(trend))
    out2 = REGISTRY["ts_bartels_rank"].spark(spark, str(tmp_path)).collect()[0]
    assert out2.rvn < 1.0 and out2.z < 0


def test_adf_rejects_on_mean_reverting_series(spark, tmp_path):
    """A strongly alternating (anti-persistent) series has β̂ near −2
    and a hugely negative DF t — decisive rejection of the unit
    root. (The wobble keeps the regression from fitting EXACTLY:
    RSS = 0 would make the t-ratio infinite — a degenerate input, not
    a law.)"""
    alt = [
        (100.0 if i % 2 == 0 else 300.0) + (i * 7 % 11) for i in range(60)
    ]
    _orders(spark, tmp_path, _day_orders(alt))
    out = REGISTRY["ts_adf"].spark(spark, str(tmp_path)).collect()[0]
    assert out.beta < -1.5
    assert out.reject_unit_root_05


def test_kpss_rejects_on_trend_not_on_level(spark, tmp_path):
    trend = [1000.0 * (i + 1) for i in range(80)]
    _orders(spark, tmp_path, _day_orders(trend))
    out = REGISTRY["ts_kpss"].spark(spark, str(tmp_path)).collect()[0]
    assert out.reject_stationary_05
    level = [500.0 + (37.0 if (i * 7) % 3 == 0 else -21.0) for i in range(80)]
    _orders(spark, tmp_path, _day_orders(level))
    out2 = REGISTRY["ts_kpss"].spark(spark, str(tmp_path)).collect()[0]
    assert not out2.reject_stationary_05


def test_variance_ratio_below_one_for_alternation(spark, tmp_path):
    """Anti-persistent counts: q-period sums cancel, VR ≪ 1."""
    rows = []
    import datetime

    base = datetime.date(1995, 1, 1)
    ok = 0
    for i in range(60):
        cnt = 2 if i % 2 == 0 else 8
        for _ in range(cnt):
            ok += 1
            rows.append((ok, 10.0, str(base + datetime.timedelta(days=i))))
    _orders(spark, tmp_path, rows)
    out = REGISTRY["ts_variance_ratio"].spark(spark, str(tmp_path)).collect()[0]
    assert out.vr < 0.6
    assert out.z_stat < 0


def test_crosscorr_peaks_at_planted_shift(spark, tmp_path):
    """purchase counts = click counts shifted 2 hours ⇒ ccf(+2) = 1."""
    rows = []
    eid = 0
    pattern = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3, 2, 3, 8, 4]
    for h, c in enumerate(pattern):
        for _ in range(c):
            eid += 1
            rows.append((eid, 1, "click", f"2024-01-01 {h:02d}:15:00", 1.0))
    for h, c in enumerate(pattern):
        hh = h + 2
        if hh >= len(pattern) + 2:
            continue
        for _ in range(c):
            eid += 1
            rows.append(
                (eid, 1, "purchase", f"2024-01-01 {hh:02d}:45:00", 1.0)
            )
    _events(spark, tmp_path, rows)
    out = {
        r.lag: r.ccf
        for r in REGISTRY["ts_crosscorr"].spark(spark, str(tmp_path)).collect()
    }
    assert out[2] == pytest.approx(1.0, abs=1e-9)
    assert all(out[lag] < 1.0 for lag in out if lag != 2)


def test_granger_detects_planted_lead(spark, tmp_path):
    """y_t tracks x_{t−1} (plus a small deterministic wobble) ⇒ the
    unrestricted RSS collapses and F is large."""
    rows = []
    eid = 0
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3, 2, 3, 8, 4, 6, 2]
    for h, c in enumerate(xs):
        for _ in range(c):
            eid += 1
            rows.append((eid, 1, "click", f"2024-01-01 {h:02d}:10:00", 1.0))
        yc = (xs[h - 1] if h >= 1 else 1) + (1 if h % 3 == 0 else 0)
        for _ in range(yc):
            eid += 1
            rows.append(
                (eid, 1, "purchase", f"2024-01-01 {h:02d}:40:00", 1.0)
            )
    _events(spark, tmp_path, rows)
    out = REGISTRY["ts_granger"].spark(spark, str(tmp_path)).collect()[0]
    assert out.f_stat > 10.0
    assert out.rss_unrestricted < out.rss_restricted


# ---------------------------------------------------------------------------
# graph laws
# ---------------------------------------------------------------------------


def test_katz_matches_python_iteration_on_path_graph(spark, tmp_path):
    """5-node path graph (orders with consecutive supplier pairs):
    replicate the exact integer iteration in python."""
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5)]
    lines = []
    for ok, (a, b) in enumerate(pairs, start=1):
        lines.append((ok, 1, a, 1))
        lines.append((ok, 2, b, 1))
    _lineitem(spark, tmp_path, lines)
    adj = {n: [] for n in range(1, 6)}
    for a, b in pairs:
        adj[a].append(b)
        adj[b].append(a)
    x = {n: 10**9 for n in adj}
    for _ in range(6):
        x = {
            n: 10**9 + math.floor(0.05 * sum(x[m] for m in adj[n]) + 0.5)
            for n in adj
        }
    want = {n: math.floor(x[n] / 1e9 * 1e6 + 0.5) / 1e6 for n in adj}
    got = {
        r.suppkey: r.katz
        for r in REGISTRY["graph_katz"].spark(spark, str(tmp_path)).collect()
    }
    assert got == want
    assert got[3] > got[1]  # interior beats endpoint


def test_local_clustering_triangle_plus_pendant(spark, tmp_path):
    """Triangle {1,2,3} + pendant 4–1: triangle corners that close
    their only wedge get coefficient 1; the pendant gets 0."""
    lines = []
    ok = 0
    for a, b in [(1, 2), (1, 3), (2, 3), (1, 4)]:
        ok += 1
        lines.append((ok, 1, a, 1))
        lines.append((ok, 2, b, 1))
    _lineitem(spark, tmp_path, lines)
    got = {
        r.suppkey: (r.degree, r.n_triangles, r.clustering_coeff)
        for r in REGISTRY["graph_local_clustering"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert got[2] == (2, 1, 1.0)
    assert got[3] == (2, 1, 1.0)
    assert got[4] == (1, 0, 0.0)
    assert got[1][1] == 1 and got[1][0] == 3  # 1 triangle of 3 wedges
    assert got[1][2] == pytest.approx(1.0 / 3.0, abs=1e-6)


# ---------------------------------------------------------------------------
# eval_rbo
# ---------------------------------------------------------------------------


def test_rbo_identical_rankings_hits_truncated_mass(spark, tmp_path):
    """When both rankings coincide, RBO@20 = Σ_m T_m (every item
    contributes its own tail weight)."""
    from gcp_de_data_pipeline_cc_spark.plans.analytics7 import _RBO_TAILS

    texts = [" ".join(["tok"] * (60 - i)) for i in range(30)]
    _docs(spark, tmp_path, texts)
    out = REGISTRY["eval_rbo"].spark(spark, str(tmp_path)).collect()[0]
    want = math.floor(sum(_RBO_TAILS) / 1e9 * 1e6 + 0.5) / 1e6
    assert out.n_common == 20
    assert out.rbo == pytest.approx(want, abs=0)


# ---------------------------------------------------------------------------
# recsys_map_at_k
# ---------------------------------------------------------------------------


def test_map_at_k_planted_split(spark, tmp_path):
    """Customer 1 buys the #1 popular item in test (AP = 1), customer
    2 buys an item outside the top-10 (AP = 0) ⇒ MAP = 0.5, hit rate
    0.5."""
    orders, lines = [], []
    ok = 0
    # train: item 100 bought 5x, items 101..110 once each (by cust 9)
    for _ in range(5):
        ok += 1
        orders.append((ok, 10.0, "1998-01-01"))
        lines.append((ok, 100, 1, 1))
    for item in range(101, 111):
        ok += 1
        orders.append((ok, 10.0, "1998-01-01"))
        lines.append((ok, item, 1, 1))
    train_custs = [9] * ok
    # test: cust 1 buys item 100; cust 2 buys item 999 (unseen)
    ok += 1
    orders.append((ok, 10.0, "2000-01-01"))
    lines.append((ok, 100, 1, 1))
    test_custs = [1]
    ok += 1
    orders.append((ok, 10.0, "2000-01-01"))
    lines.append((ok, 999, 1, 1))
    test_custs.append(2)
    custkeys = train_custs + test_custs
    from pyspark.sql import functions as F

    (
        spark.createDataFrame(
            [
                (k, float(p), d, "3-MEDIUM", custkeys[i])
                for i, (k, p, d) in enumerate(orders)
            ],
            "o_orderkey BIGINT, o_totalprice DOUBLE, o_orderdate STRING,"
            " o_orderpriority STRING, o_custkey BIGINT",
        )
        .withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/orders.parquet")
    )
    _lineitem(spark, tmp_path, lines)
    out = REGISTRY["recsys_map_at_k"].spark(spark, str(tmp_path)).collect()[0]
    assert out.n_users == 2
    assert out.map_at_k == pytest.approx(0.5, abs=1e-9)
    assert out.hit_rate_at_k == pytest.approx(0.5, abs=1e-9)


# ---------------------------------------------------------------------------
# survival laws
# ---------------------------------------------------------------------------


def test_logrank_detects_planted_group_gap(spark, tmp_path):
    """First-click users (group 1) convert at hour 1; first-view users
    at hour 50 — the log-rank χ² must be decisively large."""
    rows = []
    eid = 0
    for u in range(10):
        eid += 1
        rows.append((eid, u, "click", "2024-01-01 00:00:00", 1.0))
        eid += 1
        rows.append((eid, u, "purchase", "2024-01-01 01:30:00", 1.0))
    for u in range(10, 20):
        eid += 1
        rows.append((eid, u, "view", "2024-01-01 00:00:00", 1.0))
        eid += 1
        rows.append((eid, u, "purchase", "2024-01-03 02:30:00", 1.0))
    _events(spark, tmp_path, rows)
    out = REGISTRY["survival_logrank"].spark(spark, str(tmp_path)).collect()[0]
    assert (out.n1_users, out.n2_users) == (10, 10)
    assert out.observed_1 == 10
    assert out.chi2 > 15.0


def test_nelson_aalen_bounds_kaplan_meier(spark):
    """Fleming–Harrington law: exp(−Ĥ(t)) ≥ Ŝ_KM(t) pointwise, and
    both estimators agree on the risk-set/event tables."""
    na = {
        r.t_hours: (r.n_risk, r.n_events, r.h_nelson_aalen)
        for r in REGISTRY["survival_nelson_aalen"]
        .spark(spark, SF_DIR)
        .collect()
    }
    km = {
        r.t_hours: (r.n_risk, r.n_events, r.s_km)
        for r in REGISTRY["survival_kaplan_meier"]
        .spark(spark, SF_DIR)
        .collect()
    }
    assert set(na) == set(km)
    for t in na:
        assert na[t][:2] == km[t][:2]
        assert math.exp(-na[t][2]) >= km[t][2] - 1e-9


# ---------------------------------------------------------------------------
# fn_jaro_winkler
# ---------------------------------------------------------------------------


def test_jaro_winkler_textbook_pairs(spark, tmp_path):
    _parts(
        spark,
        tmp_path,
        [
            (1, "martha", "B1", 1),
            (2, "marhta", "B1", 1),
            (3, "same name", "B2", 1),
            (4, "same name", "B2", 1),
            (5, "dixon", "B3", 1),
            (6, "dicksonx", "B3", 1),  # jw 0.8133
            (7, "abc", "B4", 1),
            (8, "xyz", "B4", 1),  # jw 0 — filtered out
        ],
    )
    got = {
        (r.pk_a, r.pk_b): r.jw
        for r in REGISTRY["fn_jaro_winkler"].spark(spark, str(tmp_path)).collect()
    }
    assert got[(1, 2)] == pytest.approx(0.961111, abs=1e-6)
    assert got[(3, 4)] == 1.0
    assert got[(5, 6)] == pytest.approx(0.813333, abs=1e-6)
    assert (7, 8) not in got


# ---------------------------------------------------------------------------
# wave 2: markov_stationary / graph_link_scores / stats_lilliefors /
# stats_poisson_rate / ts_cox_stuart / ts_ewma_control / eval_tost
# ---------------------------------------------------------------------------


def test_markov_stationary_uniform_on_planted_cycle(spark, tmp_path):
    """A deterministic 3-cycle click→view→purchase→click… gives the
    uniform stationary distribution."""
    rows = []
    eid = 0
    cyc = ["click", "view", "purchase"]
    for u in range(5):
        for step in range(30):
            eid += 1
            rows.append(
                (eid, u, cyc[step % 3],
                 f"2024-01-01 {step // 60:02d}:{step % 60:02d}:00", 1.0)
            )
    _events(spark, tmp_path, rows)
    out = {
        r.state: r.pi_stationary
        for r in REGISTRY["markov_stationary"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert set(out) == set(cyc)
    for v in out.values():
        assert v == pytest.approx(1.0 / 3.0, abs=1e-4)


def test_link_scores_path_graph(spark, tmp_path):
    """Path a–b–c: (a, c) is the one non-adjacent wedge pair — CN = 1,
    RA = 1/deg(b) = 1/2, PA = deg(a)·deg(c) = 1."""
    lines = []
    for ok, (x, y) in enumerate([(1, 2), (2, 3)], start=1):
        lines.append((ok, 1, x, 1))
        lines.append((ok, 2, y, 1))
    _lineitem(spark, tmp_path, lines)
    rows = (
        REGISTRY["graph_link_scores"].spark(spark, str(tmp_path)).collect()
    )
    assert len(rows) == 1
    r = rows[0]
    assert (r.supp_a, r.supp_b) == (1, 3)
    assert r.common_neighbors == 1
    assert r.resource_allocation == pytest.approx(0.5, abs=1e-6)
    assert r.preferential_attachment == 1


def test_lilliefors_matches_python_reimplementation(spark, tmp_path):
    """Reimplement the A&S Φ pipeline in plain python on a planted
    series — statistic must agree exactly (same floor quantization)."""
    vals = [100.0 + 13.0 * ((i * 7) % 10) + i for i in range(25)]
    _orders(spark, tmp_path, _day_orders(vals))
    cents = [math.floor(v * 100 + 0.5) for v in vals]
    n = len(cents)
    s = sum(cents)
    ss = sum(c * c for c in cents)
    mu = s / n
    sd = math.sqrt((n * ss - s * s) / (n * (n - 1)))

    def phi(z):
        t = 1.0 / (1.0 + 0.2316419 * abs(z))
        poly = (
            0.319381530 * t
            - 0.356563782 * t**2
            + 1.781477937 * t**3
            - 1.821255978 * t**4
            + 1.330274429 * t**5
        )
        up = 1.0 - 0.3989422804014327 * math.exp(-abs(z) * abs(z) / 2.0) * poly
        return up if z >= 0.0 else 1.0 - up

    dq = max(
        math.floor(
            max(i / n - phi((y - mu) / sd), phi((y - mu) / sd) - (i - 1) / n)
            * 1.0e9
            + 0.5
        )
        for i, y in enumerate(sorted(cents), start=1)
    )
    want = math.floor(dq / 1.0e9 * 1e6 + 0.5) / 1e6
    out = REGISTRY["stats_lilliefors"].spark(spark, str(tmp_path)).collect()[0]
    assert out.d_stat == pytest.approx(want, abs=0)


def test_lilliefors_rejects_bimodal(spark, tmp_path):
    vals = [100.0] * 50 + [900.0] * 50
    _orders(spark, tmp_path, _day_orders(vals))
    out = REGISTRY["stats_lilliefors"].spark(spark, str(tmp_path)).collect()[0]
    assert out.reject_normal_05


def test_poisson_rate_planted_burst(spark, tmp_path):
    """20 errors in the first 10 days vs 10 in the next 20 ⇒ rate
    ratio 4, positive z."""
    rows = [(900, 1, "view", "2024-01-01 00:00:00", 1.0),
            (901, 1, "view", "2024-01-30 12:00:00", 1.0)]
    eid = 0
    for i in range(20):
        eid += 1
        rows.append((eid, 1, "error", f"2024-01-{(i % 9) + 1:02d} 06:00:00", 1.0))
    for i in range(10):
        eid += 1
        rows.append(
            (100 + eid, 1, "error", f"2024-01-{11 + (i % 19):02d} 06:00:00", 1.0)
        )
    _events(spark, tmp_path, rows)
    out = REGISTRY["stats_poisson_rate"].spark(spark, str(tmp_path)).collect()[0]
    assert (out.x1, out.x2) == (20, 10)
    assert out.t2_days == 20.0
    assert out.rate_ratio == pytest.approx(4.0, abs=1e-6)
    assert out.z_stat > 0


def test_cox_stuart_detects_downtrend(spark, tmp_path):
    vals = [1000.0 - 10.0 * i for i in range(40)]
    _orders(spark, tmp_path, _day_orders(vals))
    out = REGISTRY["ts_cox_stuart"].spark(spark, str(tmp_path)).collect()[0]
    assert out.s_plus == 0 and out.s_minus == 20
    assert out.trend == "downward"


def test_ewma_control_flags_planted_spike(spark, tmp_path):
    """A stable series with one huge spike: the spike day (and its
    EWMA-decayed successors) go out of control; early days don't."""
    vals = [100.0 + (i % 5) for i in range(60)]
    vals[40] = 5000.0
    _orders(spark, tmp_path, _day_orders(vals))
    out = {
        r.t: r.out_of_control
        for r in REGISTRY["ts_ewma_control"].spark(spark, str(tmp_path)).collect()
    }
    assert out[41]  # t is 1-indexed: day 41 carries the spike
    assert not any(out[t] for t in range(1, 40))


def test_tost_aa_split_is_equivalent(spark):
    """The A/A LAW: the md5 hash split of real order values must come
    out equivalent at the ±5% margin."""
    out = REGISTRY["eval_tost"].spark(spark, SF_DIR).collect()[0]
    assert out.equivalent_05
    assert abs(out.mean_diff) < out.margin
