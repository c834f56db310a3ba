"""Semantic laws for the r4d wave: MMR rerank and ORDER BY ALL."""

from __future__ import annotations

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# ----------------------------------------------------------------- mmr

def _write_embeddings(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")


def test_mmr_prefers_diverse_over_near_duplicate(spark, tmp_path):
    # query 0; items 2 and 1 are near-duplicates of each other (2 wins
    # relevance by a hair), item 3 is equally relevant but diverse:
    # pure relevance orders 2, 1, 3 — MMR must order 2, 3, 1.
    _write_embeddings(spark, tmp_path, [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.9, 0.436, 0.0, 0.0], 1),
        (2, [0.9, 0.435, 0.01, 0.0], 1),
        (3, [0.9, -0.436, 0.0, 0.0], 1),
    ])
    # the fixed-Q sample makes every fixture vector a query; the law
    # under test is query 0's pick order
    out = [
        r
        for r in REGISTRY["recsys_mmr_rerank"]
        .spark(spark, str(tmp_path))
        .collect()
        if r.query_id == 0
    ]
    assert [(r.pick, r.item_id) for r in out] == [(1, 2), (2, 3), (3, 1)]
    # the diversity penalty is visible: pick 2's mmr beats pick 3's
    assert out[1].mmr > out[2].mmr


def test_mmr_fixture_laws(spark):
    out = REGISTRY["recsys_mmr_rerank"].spark(spark, SF_DIR).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r)
    assert len(per_q) > 0
    from gcp_de_data_pipeline_cc_spark.plans import REGISTRY as REG
    top = {}
    for r in REG["sim_topk"].spark(spark, SF_DIR).collect():
        top.setdefault(r.query_id, {})[r.neighbor_id] = r.rank
    for q, rows in per_q.items():
        rows.sort(key=lambda r: r.pick)
        ids = [r.item_id for r in rows]
        assert len(rows) == 3 and len(set(ids)) == 3
        assert all(i in top[q] for i in ids)   # picks come from the pool
        assert top[q][ids[0]] == 1             # first pick = most relevant
        # first pick's mmr = lambda * rel exactly
        assert abs(rows[0].mmr - 0.5 * rows[0].rel) < 1e-3


# ------------------------------------------------------------ order by

def test_order_by_all_sorted_and_complete(spark):
    out = REGISTRY["sql_order_by_all"].spark(spark, SF_DIR).collect()
    keys = [(r.o_orderpriority, r.o_orderstatus) for r in out]
    assert keys == sorted(keys)
    assert len(keys) == len(set(keys))
    from gcp_de_data_pipeline_cc_spark.catalog import load_table
    orders = load_table(spark, SF_DIR, "orders")
    assert sum(r.n_orders for r in out) == orders.count()
