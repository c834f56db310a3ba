"""Semantic laws for the r5w wave: strongly connected components +
JSON schema-inference census."""

from __future__ import annotations

import datetime

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# --------------------------------------------------------------------------
# graph_scc
# --------------------------------------------------------------------------


def _python_scc(edges, nodes):
    """Textbook reachability SCC over the tiny nation domain."""
    adj, radj = {}, {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        radj.setdefault(d, set()).add(s)

    def reach(start, g):
        seen, stack = {start}, [start]
        while stack:
            for nxt in g.get(stack.pop(), ()):
                if nxt not in seen:
                    seen.add(nxt)
                    stack.append(nxt)
        return seen

    out = {}
    for u in nodes:
        both = reach(u, adj) & reach(u, radj)
        out[u] = min(both)
    return out


def test_scc_matches_python_bfs(spark):
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
    nations = duckdb.sql(
        f"SELECT n_nationkey, n_name FROM '{SF_DIR}/nation.parquet'"
    ).fetchall()
    expect = _python_scc(edges, [k for k, _ in nations])
    names = dict(nations)
    out = (
        REGISTRY["graph_scc"].spark(spark, SF_DIR).toPandas()
        .set_index("nation")
    )
    sizes = {}
    for k, scc in expect.items():
        sizes[scc] = sizes.get(scc, 0) + 1
    for k, scc in expect.items():
        assert out.loc[names[k], "scc_id"] == scc
        assert out.loc[names[k], "scc_size"] == sizes[scc]
        assert out.loc[names[k], "in_cycle"] == (sizes[scc] > 1)


def test_scc_has_nontrivial_structure(spark):
    out = REGISTRY["graph_scc"].spark(spark, SF_DIR).toPandas()
    assert len(out) == 25
    # the sparsified digraph is neither fully acyclic nor one blob
    assert out.in_cycle.any()
    assert not out.in_cycle.all()
    # scc_id is always the component minimum and a member of it
    for _, r in out.iterrows():
        assert r.scc_id <= 24


# --------------------------------------------------------------------------
# fn_json_schema_infer
# --------------------------------------------------------------------------


def test_json_infer_planted_conflicts(spark):
    out = (
        REGISTRY["fn_json_schema_infer"].spark(spark, SF_DIR).toPandas()
        .set_index("key")
    )
    assert set(out.index) == {
        "k", "device", "dur_ms", "price", "tags", "flag",
    }
    # k: always present, number 3/4 + string 1/4 -> widened
    k = out.loc["k"]
    assert k.n_missing == 0 and k.presence_pct == 1.0
    assert k.inferred_type == "string_widened"
    assert k.n_number == 3 * k.n_string or abs(
        k.n_number - 3 * k.n_string
    ) <= 3  # event_id % 4 split is near-exact
    assert not k.nullable
    # device: shapes 0 and 1 only; shape 1 is an explicit null
    d = out.loc["device"]
    assert d.inferred_type == "string"
    assert d.n_null > 0 and d.nullable
    assert abs(d.presence_pct - 0.5) < 0.01
    # tags is array-typed, flag bool-typed, both quarter-present
    assert out.loc["tags", "inferred_type"] == "array"
    assert out.loc["flag", "inferred_type"] == "bool"
    assert out.loc["price", "inferred_type"] == "number"
    assert out.loc["dur_ms", "inferred_type"] == "number"
    for key in ("tags", "flag", "price", "dur_ms"):
        assert out.loc[key, "nullable"]  # missing in other shapes


def test_json_infer_counts_are_shape_exact(spark, tmp_path):
    # 8 events -> exactly 2 per shape; every count is then exact.
    rows = [
        (i, datetime.datetime(2024, 1, 1, i), 1, "click", 2.0, '{"k": 7}')
        for i in range(8)
    ]
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = (
        REGISTRY["fn_json_schema_infer"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .set_index("key")
    )
    assert (out.n_total == 8).all()
    assert out.loc["k", "n_number"] == 6
    assert out.loc["k", "n_string"] == 2
    assert out.loc["device", "n_string"] == 2  # shape 0
    assert out.loc["device", "n_null"] == 2    # shape 1 explicit null
    assert out.loc["device", "n_missing"] == 4
    assert out.loc["tags", "n_array"] == 2
    assert out.loc["flag", "n_bool"] == 2
    assert out.loc["price", "n_number"] == 2
    assert out.loc["dur_ms", "n_number"] == 2
