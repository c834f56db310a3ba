"""Semantic laws for the r6e wave: deterministic walk corpus +
burstiness diagnostics."""

from __future__ import annotations

import datetime
import hashlib
import math

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# --------------------------------------------------------------------------
# graph_walk_corpus
# --------------------------------------------------------------------------


def _adj_from_duckdb():
    import duckdb

    edges = duckdb.sql(
        f"""
        SELECT src, dst FROM (
            SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src
                                ORDER BY w DESC, dst) rn
            FROM (SELECT c.c_nationkey src, s.s_nationkey dst, COUNT(*) w
                  FROM '{SF_DIR}/lineitem.parquet' l
                  JOIN '{SF_DIR}/orders.parquet' o
                    ON l.l_orderkey = o.o_orderkey
                  JOIN '{SF_DIR}/customer.parquet' c
                    ON o.o_custkey = c.c_custkey
                  JOIN '{SF_DIR}/supplier.parquet' s
                    ON l.l_suppkey = s.s_suppkey
                  WHERE c.c_nationkey <> s.s_nationkey
                  GROUP BY 1, 2)) WHERE rn <= 3
        """
    ).fetchall()
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    return {k: sorted(v) for k, v in adj.items()}


def _python_walk(walk_id, start, adj, L=8):
    path, cur = [start], start
    for step in range(1, L + 1):
        dsts = adj.get(cur)
        if not dsts:
            break
        coin = int(
            hashlib.md5(f"walk:{walk_id}:{cur}:{step}".encode())
            .hexdigest()[:4], 16
        )
        cur = dsts[coin % len(dsts)]
        path.append(cur)
    return "-".join(str(p) for p in path)


def test_walks_match_python_exactly(spark):
    adj = _adj_from_duckdb()
    out = (
        REGISTRY["graph_walk_corpus"].spark(spark, SF_DIR).toPandas()
        .set_index("walk_id")
    )
    assert len(out) == 100  # 25 nations x 4 walks
    for wid, row in out.iterrows():
        expect = _python_walk(wid, row.start_n, adj)
        assert row.path == expect, (wid, row.path, expect)
    # every consecutive pair is a real edge
    for _, row in out.iterrows():
        nodes = [int(x) for x in row.path.split("-")]
        for a, b in zip(nodes, nodes[1:]):
            assert b in adj[a]


def test_walks_are_sentences(spark):
    out = REGISTRY["graph_walk_corpus"].spark(spark, SF_DIR).toPandas()
    assert (out.n_steps <= 8).all()
    assert (out.n_distinct <= out.n_steps + 1).all()
    # the sparsified digraph has sinks, so some walks stop early, and
    # connected starts produce full-length walks
    assert (out.n_steps == 8).any()


# --------------------------------------------------------------------------
# ts_burstiness
# --------------------------------------------------------------------------


def test_burstiness_matches_python(spark):
    import duckdb

    out = (
        REGISTRY["ts_burstiness"].spark(spark, SF_DIR).toPandas()
        .set_index("event_type")
    )
    rows = duckdb.sql(
        f"""
        SELECT event_type, epoch_us(ts) us
        FROM '{SF_DIR}/events.parquet' ORDER BY event_type, us
        """
    ).fetchall()
    series = {}
    for et, us in rows:
        series.setdefault(et, []).append(us)
    for et, uss in series.items():
        gaps = [(b - a) // 1000 for a, b in zip(uss, uss[1:])]
        n, s1 = len(gaps), sum(gaps)
        s2 = sum(g * g for g in gaps)
        sig = math.sqrt(n * s2 - s1 * s1)
        b = (sig - s1) / (sig + s1)
        assert abs(out.loc[et, "burstiness"] - b) < 2e-6
        assert out.loc[et, "n_gaps"] == n
        assert out.loc[et, "mean_gap_ms"] == s1 // n


def test_burstiness_clocked_stream_is_minus_one(spark, tmp_path):
    # perfectly regular arrivals: sigma = 0 -> B = -1 exactly; one
    # event per day -> daily counts constant -> Fano = 0
    rows = []
    t0 = datetime.datetime(2024, 1, 1)
    for d in range(30):
        rows.append(
            (d, t0 + datetime.timedelta(days=d), 1, "click", 1.0, "{}")
        )
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = (
        REGISTRY["ts_burstiness"].spark(spark, str(tmp_path))
        .toPandas().iloc[0]
    )
    assert out.burstiness == -1.0
    assert out.fano_daily == 0.0
    assert out.mean_gap_ms == 86_400_000
