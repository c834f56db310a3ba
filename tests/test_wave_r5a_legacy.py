"""Semantic laws for the r5a wave: exact betweenness + permutation test."""

from __future__ import annotations

import collections
import datetime
import hashlib

import duckdb

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR

K, H, U = 3, 4, 1_000_000


def _backbone_edges():
    return duckdb.sql(f"""
        WITH e AS (
            SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
                   COUNT(*) AS w
            FROM '{SF_DIR}/lineitem.parquet' l
            JOIN '{SF_DIR}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
            JOIN '{SF_DIR}/customer.parquet' c ON o.o_custkey = c.c_custkey
            JOIN '{SF_DIR}/supplier.parquet' s ON l.l_suppkey = s.s_suppkey
            WHERE c.c_nationkey <> s.s_nationkey GROUP BY 1, 2),
        r AS (SELECT src, dst, ROW_NUMBER() OVER (
                  PARTITION BY src ORDER BY w DESC, dst) rn FROM e)
        SELECT DISTINCT LEAST(src, dst) a, GREATEST(src, dst) b
        FROM r WHERE rn <= {K}
    """).fetchall()


def _python_betweenness(edges):
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    nodes = sorted(adj)
    dist, sig = {}, {}
    for s in nodes:
        # layered BFS: distances + shortest-path counts within horizon
        d = {s: 0}
        g = {s: 1}
        layer = [s]
        for step in range(1, H + 1):
            counts = collections.defaultdict(int)
            for u in layer:
                for v in adj[u]:
                    if v not in d:
                        counts[v] += g[u]
            layer = []
            for v, c in counts.items():
                d[v] = step
                g[v] = c
                layer.append(v)
        dist[s], sig[s] = d, g
    bc = collections.defaultdict(int)
    for s in nodes:
        for t in nodes:
            if not (s < t and t in dist[s]):
                continue
            dst_, sg_ = dist[s][t], sig[s][t]
            for v in nodes:
                if v in (s, t) or v not in dist[s] or t not in dist[v]:
                    continue
                if dist[s][v] + dist[v][t] == dst_:
                    bc[v] += (sig[s][v] * sig[v][t] * U) // sg_
    return bc


def test_betweenness_matches_python_brandes(spark):
    out = (
        REGISTRY["graph_betweenness"].spark(spark, SF_DIR).toPandas()
    )
    nations = duckdb.sql(
        f"SELECT n_nationkey, n_name FROM '{SF_DIR}/nation.parquet'"
    ).fetchall()
    name_to_key = {n: k for k, n in nations}
    ref = _python_betweenness(_backbone_edges())
    for _, r in out.iterrows():
        assert r.bc_micro == ref.get(name_to_key[r.n_name], 0)
    # sanity: someone actually brokers paths on the sparsified graph
    assert out.bc_micro.max() > 0
    # normalization bounded by 1
    assert (out.betweenness_norm <= 1.0).all()


def test_permutation_null_and_planted(spark, tmp_path):
    def write(vals, path):
        rows = [
            (
                uid,
                uid,
                "purchase",
                datetime.datetime(2024, 3, 5, 10, 0, 0),
                v,
                "s",
            )
            for uid, v in vals
        ]
        spark.createDataFrame(
            rows,
            "event_id BIGINT, user_id BIGINT, event_type STRING, "
            "ts TIMESTAMP, value DOUBLE, session_id STRING",
        ).write.mode("overwrite").parquet(f"{path}/events.parquet")

    # null: identical spend everywhere -> every replicate stat == 0 ==
    # observed -> p = (1 + B)/(B + 1) = 1 exactly
    write([(u, 25.0) for u in range(120)], tmp_path / "null")
    out = (
        REGISTRY["hypothesis_permutation"]
        .spark(spark, str(tmp_path / "null"))
        .toPandas()
        .iloc[0]
    )
    assert out.stat_obs == 0.0
    assert out.n_ge == 199
    assert out.p_value == 1.0

    # planted: arm A (md5 coin) spends 100, arm B spends 1 -> observed
    # stat dwarfs every label permutation -> minimal p = 1/200
    vals = []
    for u in range(200):
        arm_a = hashlib.md5(f"arm:{u}".encode()).hexdigest()[0] < "8"
        vals.append((u, 100.0 if arm_a else 1.0))
    write(vals, tmp_path / "planted")
    out = (
        REGISTRY["hypothesis_permutation"]
        .spark(spark, str(tmp_path / "planted"))
        .toPandas()
        .iloc[0]
    )
    assert out.p_value == 0.005
    assert out.n_ge == 0
    assert out.mean_a > out.mean_b


def test_permutation_sf_identities(spark):
    out = (
        REGISTRY["hypothesis_permutation"].spark(spark, SF_DIR).toPandas().iloc[0]
    )
    assert out.n_perms == 199
    assert 0.005 <= out.p_value <= 1.0
    assert abs(out.p_value - round((1 + out.n_ge) / 200, 6)) < 1e-9
    assert out.n_users > 0
