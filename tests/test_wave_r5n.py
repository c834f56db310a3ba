"""Semantic laws for the r5n wave: corpus data card + articulation."""

from __future__ import annotations

import collections

import duckdb

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_data_card_recompute(spark):
    out = REGISTRY["corpus_data_card"].spark(spark, SF_DIR).toPandas().iloc[0]
    docs = duckdb.sql(
        f"SELECT doc_id, lang, text FROM '{SF_DIR}/documents.parquet'"
    ).df()
    toks = docs.text.str.split(" ")
    assert out.n_docs == len(docs)
    assert out.n_tokens == int(toks.str.len().sum())
    vocab = set()
    for t in toks:
        vocab.update(t)
    assert out.vocab_size == len(vocab)
    assert abs(out.ttr - round(len(vocab) / out.n_tokens, 6)) < 1e-9
    # dup accounting: total docs minus distinct texts
    assert out.n_dup_docs == len(docs) - docs.text.nunique()
    # language mode
    top = docs.lang.value_counts()
    assert out.top_lang in set(
        top[top == top.max()].index
    )
    assert 0 <= out.gopher_pass_rate <= 1
    assert out.mean_doc_tokens > 0 and out.median_doc_tokens > 0


def test_data_card_consistent_with_gopher_key(spark):
    card = REGISTRY["corpus_data_card"].spark(spark, SF_DIR).toPandas().iloc[0]
    rules = REGISTRY["quality_gopher_rules"].spark(spark, SF_DIR).toPandas()
    assert abs(
        card.gopher_pass_rate - round(rules.pass_all.sum() / len(rules), 6)
    ) < 1e-9


def _backbone(sf_dir, k=3):
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


def _components(edges, removed=None):
    adj = collections.defaultdict(set)
    for a, b in edges:
        if removed in (a, b):
            continue
        adj[a].add(b)
        adj[b].add(a)
    nodes = {n for e in edges for n in e if n != removed}
    seen, comp = set(), 0
    for s in sorted(nodes):
        if s in seen:
            continue
        comp += 1
        stack = [s]
        while stack:
            u = stack.pop()
            if u in seen:
                continue
            seen.add(u)
            stack.extend(adj[u] - seen)
    return comp


def test_articulation_matches_python_bfs(spark):
    out = (
        REGISTRY["graph_articulation"].spark(spark, SF_DIR).toPandas()
    )
    edges = _backbone(SF_DIR)
    full = _components(edges)
    nations = dict(
        duckdb.sql(
            f"SELECT n_name, n_nationkey FROM '{SF_DIR}/nation.parquet'"
        ).fetchall()
    )
    in_graph = {n for e in edges for n in e}
    for _, r in out.iterrows():
        key = nations[r.n_name]
        assert r.comp_full == full
        if key in in_graph:
            expect = _components(edges, removed=key)
            assert r.comp_without == expect
            assert r.is_articulation == int(expect > full)
        else:
            assert r.is_articulation == 0
