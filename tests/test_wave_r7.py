"""Semantic laws for the round-7 wave: bounded-cell quantizer, index
rebalance, graph-ANN long-range links."""

from __future__ import annotations

import numpy as np

from gcp_de_data_pipeline_cc_spark.operators import similarity as sim
from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# bounded_cells — the coarse quantizer's hard invariants
# ---------------------------------------------------------------------------

def test_bounded_cells_hard_bound_and_determinism(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    a = sim.bounded_cells(emb).select("vec_id", "label", "chunk").toPandas()
    b = sim.bounded_cells(emb).select("vec_id", "label", "chunk").toPandas()
    m = a.merge(b, on="vec_id", suffixes=("_a", "_b"))
    assert (m.chunk_a == m.chunk_b).all()  # deterministic re-run
    sizes = a.groupby(["label", "chunk"]).size()
    assert sizes.max() <= sim.BOUNDED_CELL_SIZE  # |cell| <= bound, HARD
    # chunk ids are dense from 0 within each label
    for _, g in a.groupby("label"):
        assert set(g.chunk) == set(range(g.chunk.max() + 1))


def test_bounded_cells_splits_oversized_label(spark, tmp_path):
    """A single label with 3x bound identical-direction vectors still
    splits into ceil(n/bound) chunks — the skew case the quantizer
    exists for (replicated corpora, one hot label)."""
    n = 3 * sim.BOUNDED_CELL_SIZE + 5
    rows = [(i, [1.0] * 8, 0) for i in range(n)]
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    emb = spark.read.parquet(f"{tmp_path}/embeddings.parquet")
    out = sim.bounded_cells(emb).select("vec_id", "chunk").toPandas()
    sizes = out.groupby("chunk").size()
    assert len(sizes) == 4  # ceil(101/32)
    assert sizes.max() <= sim.BOUNDED_CELL_SIZE


def test_bounded_cells_wide_vector_truncates_not_nulls(spark):
    """r7 ADVICE: a vector LONGER than dim used to null-pad the plane in
    zip_with and yield a NULL projection (every row landed in one NULL
    cell).  The projection is now a truncate-to-dim dot: an 80-dim
    vector gets the same chunks as its 64-dim prefix, and the DuckDB
    twin agrees instead of erroring on mismatched list lengths."""
    import duckdb

    rng = np.random.default_rng(7)
    wide = rng.normal(size=(70, 80)).astype(float)
    rows = [(i, [float(x) for x in wide[i]], int(i % 2)) for i in range(70)]
    df = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    )
    got = (
        sim.bounded_cells(df, keep_proj="proj")
        .select("vec_id", "proj", "chunk")
        .toPandas()
        .sort_values("vec_id")
    )
    assert got.proj.notna().all()
    # the float32-roundtripped prefix is what Spark actually quantizes —
    # feed the same values to the DuckDB twin
    pfx = wide[:, :64].astype(np.float32)
    con = duckdb.connect()
    con.register(
        "v",
        __import__("pandas").DataFrame(
            {"vec_id": range(70), "embedding": [list(map(float, r)) for r in pfx]}
        ),
    )
    want = con.execute(
        f"SELECT vec_id, {sim.sql_bounded_cells_proj('embedding')} AS proj "
        "FROM v ORDER BY vec_id"
    ).df()
    assert (got.proj.values == want.proj.values.astype("int64")).all()


# ---------------------------------------------------------------------------
# sim_index_rebalance
# ---------------------------------------------------------------------------

def test_rebalance_census_invariants(spark):
    out = REGISTRY["sim_index_rebalance"].spark(spark, SF_DIR).toPandas()
    assert (out.n_total == out.n_base + out.n_delta).all()
    # the whole point: every split cell honours the hard bound
    split = out[out.split]
    assert (split.max_subcell <= sim.BOUNDED_CELL_SIZE).all()
    # unsplit cells stay one cell
    unsplit = out[~out.split]
    assert (unsplit.n_subcells == 1).all()
    assert (unsplit.max_subcell == unsplit.n_total).all()
    # a retrain flag always implies a split (flag OR oversize triggers)
    assert (~out.retrain_flag | out.split).all()


def test_rebalance_planted_skew_fires_retrain_flag(spark, tmp_path):
    """Delta arrivals concentrated on one cell (all near centroid 0)
    cross the 2x fair-share threshold: the retrain flag fires for that
    cell and the composed key SPLITS it even though its size alone
    (18 <= bound) never would."""
    rows = []
    centers = np.eye(3, 8)
    base_ids = [i for i in range(200) if i % 10 < 8]
    k = 0
    for lab in range(3):
        for j in range(12):
            v = centers[lab] + 0.01 * np.eye(8)[3 + (j % 4)]
            rows.append((base_ids[k], [float(x) for x in v], lab))
            k += 1
    delta_ids = [i for i in range(200) if i % 10 >= 8][:6]
    for j, did in enumerate(delta_ids):
        v = centers[0] + 0.01 * np.eye(8)[4 + (j % 3)]
        rows.append((did, [float(x) for x in v], j % 3))
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = (
        REGISTRY["sim_index_rebalance"].spark(spark, str(tmp_path))
        .toPandas().set_index("cell")
    )
    assert out.loc[0, "n_delta"] == 6  # every arrival routed to cell 0
    assert bool(out.loc[0, "retrain_flag"]) and bool(out.loc[0, "split"])
    assert out.loc[0, "n_total"] == 18
    assert not out.loc[1, "retrain_flag"] and not out.loc[1, "split"]
    assert out.loc[1, "n_subcells"] == 1


# ---------------------------------------------------------------------------
# sim_topk_graph long-range links (r7 rework)
# ---------------------------------------------------------------------------

def test_graph_ann_long_links_reach_cross_cell_neighbors(spark, tmp_path):
    """Two labels whose vectors INTERLEAVE geometrically (labels are
    assigned adversarially against geometry): with in-cell-only edges
    the r6 build lost most cross-cell neighbors; the long-range links
    + medoid reps must now find a large share of them."""
    rng = np.random.default_rng(11)
    center = rng.normal(size=64)
    rows = []
    for i in range(80):
        v = center + 0.05 * rng.normal(size=64)
        rows.append((i, [float(x) for x in v], i % 2))  # label fights geometry
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = REGISTRY["sim_topk_graph"].spark(spark, str(tmp_path)).toPandas()
    assert out.recall.mean() >= 0.7, out.recall.describe()
