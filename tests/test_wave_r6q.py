"""Semantic laws for the r6q wave: PSI drift gate, soft dedup weights,
Syntetos-Boylan demand classification."""

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
# qc_psi
# ---------------------------------------------------------------------------

def test_psi_matches_python(spark):
    import duckdb

    rows = duckdb.sql(
        f"SELECT CAST(ts AS DATE), value FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    days = [d for d, _ in rows]
    d0, d1 = min(days), max(days)
    mid = d0 + datetime.timedelta(days=((d1 - d0).days // 2))
    counts = {0: [0] * 10, 1: [0] * 10}
    for d, v in rows:
        half = int(d > mid)
        counts[half][min(int(v // 50.0), 9)] += 1
    t = {h: sum(c) for h, c in counts.items()}
    total_q = 0
    terms = []
    for b in range(10):
        p = (counts[0][b] + 1) / (t[0] + 10)
        q = (counts[1][b] + 1) / (t[1] + 10)
        term = (q - p) * math.log(q / p)
        terms.append((b, p, q, term))
        total_q += math.floor(term * 1e9 + 0.5)
    psi = math.floor(total_q / 1e9 * 1e6 + 0.5) / 1e6
    out = REGISTRY["qc_psi"].spark(spark, SF_DIR).toPandas().set_index("bin")
    assert len(out) == 10
    for b, p, q, term in terms:
        assert abs(out.loc[b, "p_ref"] - math.floor(p * 1e6 + 0.5) / 1e6) < 1e-12
        assert abs(out.loc[b, "p_cur"] - math.floor(q * 1e6 + 0.5) / 1e6) < 1e-12
        assert abs(out.loc[b, "psi"] - psi) < 1e-12
        assert out.loc[b, "is_watch"] == int(psi * 1000 > 100)
        assert out.loc[b, "is_action"] == int(psi * 1000 > 250)


def test_psi_planted_shift_triggers_action(spark, tmp_path):
    """First half all in bin 0, second half all in bin 9: maximal
    drift, PSI far beyond 0.25."""
    rows = []
    d0 = datetime.datetime(2024, 1, 1)
    for i in range(100):
        rows.append((i, d0 + datetime.timedelta(days=i % 5), i,
                     "click", 10.0, "{}"))
    for i in range(100):
        rows.append((100 + i, d0 + datetime.timedelta(days=10 + i % 5),
                     i, "click", 480.0, "{}"))
    _write_events(spark, tmp_path, rows)
    out = REGISTRY["qc_psi"].spark(spark, str(tmp_path)).toPandas()
    assert (out.is_action == 1).all() and (out.is_watch == 1).all()
    assert out.psi.iloc[0] > 1.0


def test_psi_identical_halves_scores_zero(spark, tmp_path):
    rows = []
    d0 = datetime.datetime(2024, 1, 1)
    eid = 0
    for day in (0, 1, 10, 11):
        for v in (10.0, 60.0, 110.0, 480.0):
            rows.append((eid, d0 + datetime.timedelta(days=day), eid,
                         "click", v, "{}"))
            eid += 1
    _write_events(spark, tmp_path, rows)
    out = REGISTRY["qc_psi"].spark(spark, str(tmp_path)).toPandas()
    assert (out.psi == 0).all()
    assert (out.is_watch == 0).all() and (out.is_action == 0).all()


# ---------------------------------------------------------------------------
# corpus_soft_dedup_weights
# ---------------------------------------------------------------------------

def test_soft_dedup_consistent_with_clusters(spark):
    import duckdb

    cc = (
        REGISTRY["dedup_clusters"].spark(spark, SF_DIR).toPandas()
    )
    sizes = cc.groupby("cluster_id").size().to_dict()
    member_cluster = dict(zip(cc.doc_id, cc.cluster_id))
    docs = duckdb.sql(
        f"SELECT doc_id, source FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    exp: dict[str, list] = {}
    for did, src in docs:
        if did in member_cluster:
            wq = math.floor(1e6 / sizes[member_cluster[did]] + 0.5)
            clustered = 1
        else:
            wq, clustered = 1000000, 0
        e = exp.setdefault(src, [0, 0, 0])
        e[0] += 1
        e[1] += clustered
        e[2] += wq
    out = (
        REGISTRY["corpus_soft_dedup_weights"].spark(spark, SF_DIR)
        .toPandas().set_index("source")
    )
    assert set(out.index) == set(exp)
    for src, (n, ncl, wq) in exp.items():
        r = out.loc[src]
        assert r.n_docs == n and r.n_clustered == ncl
        assert abs(r.effective_docs
                   - math.floor(wq / 1e6 * 1e4 + 0.5) / 1e4) < 1e-12
        assert abs(r.dedup_discount
                   - math.floor((1 - wq / 1e6 / n) * 1e4 + 0.5) / 1e4) < 1e-12
        assert r.effective_docs <= r.n_docs + 1e-9
        assert 0 <= r.dedup_discount < 1


# ---------------------------------------------------------------------------
# ts_demand_classification
# ---------------------------------------------------------------------------

def test_demand_quadrants_planted(spark, tmp_path):
    d0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def purchases(uid, day, k):
        nonlocal eid
        for _ in range(k):
            rows.append((eid, d0 + datetime.timedelta(days=day), uid,
                         "purchase", 1.0, "{}"))
            eid += 1

    # span pinned to 20 days by a purchase-free click user
    rows.append((900000, d0, 99, "click", 1.0, "{}"))
    rows.append((900001, d0 + datetime.timedelta(days=19), 99,
                 "click", 1.0, "{}"))
    eid = 2
    for day in range(20):          # user 1: smooth (daily, constant)
        purchases(1, day, 2)
    for day in (0, 5, 10, 15):     # user 2: intermittent (sparse, flat)
        purchases(2, day, 3)
    for day in range(20):          # user 3: erratic (daily, wild sizes)
        purchases(3, day, 1 if day % 2 == 0 else 10)
    for day, k in ((0, 1), (6, 1), (12, 1), (18, 10)):  # user 4: lumpy
        purchases(4, day, k)
    _write_events(spark, tmp_path, rows)
    out = (
        REGISTRY["ts_demand_classification"].spark(spark, str(tmp_path))
        .toPandas().set_index("pattern")
    )
    assert set(out.index) == {"smooth", "intermittent", "erratic", "lumpy"}
    assert (out.n_users == 1).all()
    assert (out.share == 0.25).all()


def test_demand_classification_matches_python(spark):
    import duckdb

    span = duckdb.sql(
        f"""SELECT MAX(CAST(ts AS DATE)) - MIN(CAST(ts AS DATE)) + 1
        FROM '{SF_DIR}/events.parquet'"""
    ).fetchone()[0]
    dem = duckdb.sql(
        f"""SELECT user_id, CAST(ts AS DATE), COUNT(*)
        FROM '{SF_DIR}/events.parquet'
        WHERE event_type = 'purchase' GROUP BY 1, 2"""
    ).fetchall()
    per: dict[int, list] = {}
    for u, _, x in dem:
        e = per.setdefault(u, [0, 0, 0])
        e[0] += 1
        e[1] += x
        e[2] += x * x
    hist: dict[str, int] = {}
    for nd, s, ss in per.values():
        adi_hi = span * 100 > 132 * nd
        cv2_hi = (nd * ss - s * s) * 100 > 49 * s * s
        name = {
            (False, False): "smooth",
            (True, False): "intermittent",
            (False, True): "erratic",
            (True, True): "lumpy",
        }[(adi_hi, cv2_hi)]
        hist[name] = hist.get(name, 0) + 1
    out = (
        REGISTRY["ts_demand_classification"].spark(spark, SF_DIR)
        .toPandas().set_index("pattern")
    )
    assert set(out.index) == set(hist)
    n = sum(hist.values())
    for name, k in hist.items():
        assert out.loc[name, "n_users"] == k
        assert abs(out.loc[name, "share"]
                   - math.floor(k / n * 1e4 + 0.5) / 1e4) < 1e-12
