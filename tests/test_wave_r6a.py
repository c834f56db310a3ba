"""Semantic laws for the r6a wave: Tarjan low-link articulation,
FW-BW-Trim pivot SCC, and convergence-looped min-label propagation."""

from __future__ import annotations

import collections

import duckdb
import pandas as pd

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from gcp_de_data_pipeline_cc_spark.plans.graph import _tarjan_cut_counts
from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# fixture warehouse: one (src -> dst) trade edge per desired digraph edge
# ---------------------------------------------------------------------------

def _write_trade_graph(spark, tmp_path, edges, n_nations):
    """Plant a nation trade digraph: edge i = customer in nation src
    ordering one lineitem supplied from nation dst."""
    nations = [(i, f"N{i:02d}") for i in range(n_nations)]
    custs, supps, orders, lines = [], [], [], []
    for i, (src, dst) in enumerate(edges):
        custs.append((i, src))
        supps.append((i, dst))
        orders.append((i, i))
        lines.append((i, i))
    spark.createDataFrame(
        nations, "n_nationkey BIGINT, n_name STRING"
    ).write.mode("overwrite").parquet(f"{tmp_path}/nation.parquet")
    spark.createDataFrame(
        custs, "c_custkey BIGINT, c_nationkey BIGINT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(
        supps, "s_suppkey BIGINT, s_nationkey BIGINT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/supplier.parquet")
    spark.createDataFrame(
        orders, "o_orderkey BIGINT, o_custkey BIGINT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        lines, "l_orderkey BIGINT, l_suppkey BIGINT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")


# ---------------------------------------------------------------------------
# graph_articulation_tarjan
# ---------------------------------------------------------------------------

def test_tarjan_matches_deletion_sweep(spark):
    """The one-DFS low-link form must reproduce the |V|+1-deletion
    sweep's verdict set exactly — same oracle, same frame."""
    a = (
        REGISTRY["graph_articulation"].spark(spark, SF_DIR).toPandas()
        .sort_values("n_name").reset_index(drop=True)
    )
    b = (
        REGISTRY["graph_articulation_tarjan"].spark(spark, SF_DIR)
        .toPandas().sort_values("n_name").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_tarjan_cut_counts_hand_graph():
    """Bridge + triangle + separate pair, verified against hand
    component counts: comp_without = comp_full - 1 + parts."""
    # component 1: path 1-2-3 with triangle 3-4-5 (3-4, 4-5, 3-5)
    # component 2: pair 6-7
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (3, 5), (6, 7)]
    pdf = pd.DataFrame(
        [(u, v) for u, v in edges] + [(v, u) for u, v in edges],
        columns=["u", "v"],
    )
    out = _tarjan_cut_counts(pdf).set_index("v")
    assert (out.comp_full == 2).all()
    expect_without = {1: 2, 2: 3, 3: 3, 4: 2, 5: 2, 6: 2, 7: 2}
    for v, cw in expect_without.items():
        assert out.loc[v, "comp_without"] == cw, (v, out.loc[v].to_dict())


# ---------------------------------------------------------------------------
# graph_scc_fwbw
# ---------------------------------------------------------------------------

def test_fwbw_matches_squaring_labels(spark):
    """Cross-verification the docstring promises: FW-BW-Trim output ==
    graph_scc's closure-by-squaring output, row for row."""
    a = (
        REGISTRY["graph_scc"].spark(spark, SF_DIR).toPandas()
        .sort_values("nation").reset_index(drop=True)
    )
    b = (
        REGISTRY["graph_scc_fwbw"].spark(spark, SF_DIR).toPandas()
        .sort_values("nation").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_fwbw_planted_two_cycles(spark, tmp_path):
    """Two 3-cycles joined by a one-way bridge: the pivot's F∩B is
    exactly the first cycle, the second survives as the F∖S part, and
    the bridge never merges them."""
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    _write_trade_graph(spark, tmp_path, edges, n_nations=6)
    out = (
        REGISTRY["graph_scc_fwbw"].spark(spark, str(tmp_path)).toPandas()
        .set_index("nation")
    )
    assert len(out) == 6
    for i in (0, 1, 2):
        assert out.loc[f"N{i:02d}", "scc_id"] == 0
    for i in (3, 4, 5):
        assert out.loc[f"N{i:02d}", "scc_id"] == 3
    assert (out.scc_size == 3).all()
    assert out.in_cycle.all()


def test_fwbw_trim_retires_acyclic_chain(spark, tmp_path):
    """A pure DAG (chain 0->1->2->3) is all singleton SCCs; Trim must
    retire every node without any pivot BFS finding a cycle."""
    edges = [(0, 1), (1, 2), (2, 3)]
    _write_trade_graph(spark, tmp_path, edges, n_nations=4)
    out = (
        REGISTRY["graph_scc_fwbw"].spark(spark, str(tmp_path)).toPandas()
    )
    assert len(out) == 4
    assert (out.scc_size == 1).all()
    assert (~out.in_cycle).all()
    assert sorted(out.scc_id) == [0, 1, 2, 3]


# ---------------------------------------------------------------------------
# graph_label_propagation_converged
# ---------------------------------------------------------------------------

def _undirected_backbone(sf_dir, k=3):
    return duckdb.sql(f"""
        WITH e AS (
            SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) w
            FROM '{sf_dir}/lineitem.parquet' l
            JOIN '{sf_dir}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
            JOIN '{sf_dir}/customer.parquet' c ON o.o_custkey = c.c_custkey
            JOIN '{sf_dir}/supplier.parquet' s ON l.l_suppkey = s.s_suppkey
            WHERE c.c_nationkey <> s.s_nationkey GROUP BY 1, 2),
        r AS (SELECT src, dst, ROW_NUMBER() OVER (
                  PARTITION BY src ORDER BY w DESC, dst) rn FROM e)
        SELECT DISTINCT LEAST(src, dst) a, GREATEST(src, dst) b
        FROM r WHERE rn <= {k}
    """).fetchall()


def test_lpa_converged_rounds_law(spark):
    """Communities = connected components labeled by min member; the
    rounds column = max BFS distance from the min node, recomputed in
    python from the same backbone."""
    edges = _undirected_backbone(SF_DIR)
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    comp, dist = {}, {}
    for s in sorted(adj):
        if s in comp:
            continue
        # BFS from s (the min unvisited node IS the component min)
        frontier, d = [s], 0
        comp[s], dist[s] = s, 0
        while frontier:
            d += 1
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if w not in comp:
                        comp[w], dist[w] = s, d
                        nxt.append(w)
            frontier = nxt
    sizes = collections.Counter(comp.values())
    rounds = collections.defaultdict(int)
    for v, c in comp.items():
        rounds[c] = max(rounds[c], dist[v])
    nations = dict(
        duckdb.sql(
            f"SELECT n_nationkey, n_name FROM '{SF_DIR}/nation.parquet'"
        ).fetchall()
    )
    out = (
        REGISTRY["graph_label_propagation_converged"]
        .spark(spark, SF_DIR).toPandas().set_index("nation")
    )
    assert len(out) == len(comp)
    for v, c in comp.items():
        row = out.loc[nations[v]]
        assert row.community == c
        assert row.community_size == sizes[c]
        assert row.rounds_to_convergence == rounds[c]


def test_lpa_converged_path_graph(spark, tmp_path):
    """Path 0-1-2-3-4 (symmetrized): one community labeled 0, size 5,
    converging in exactly 4 rounds — the eccentricity of the min
    node, pinned by hand."""
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    _write_trade_graph(spark, tmp_path, edges, n_nations=5)
    out = (
        REGISTRY["graph_label_propagation_converged"]
        .spark(spark, str(tmp_path)).toPandas()
    )
    assert len(out) == 5
    assert (out.community == 0).all()
    assert (out.community_size == 5).all()
    assert (out.rounds_to_convergence == 4).all()
