"""Semantic laws for the r4w wave: semantic decontamination + column
lineage closure."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# --------------------------------------------------------------------------
# decontaminate_semantic
# --------------------------------------------------------------------------


def _write_embeddings(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")


def test_semantic_decon_planted_contamination(spark, tmp_path):
    # train vec 7 IS eval vec 0 (vec_id % 50 == 0) -> cosine 1.0, flagged;
    # train vec 3 is orthogonal -> never flagged
    base = [1.0] * 32 + [0.0] * 32
    orth = [0.0] * 32 + [1.0] * 32
    near = [1.0] * 31 + [0.9] + [0.0] * 32
    assert len(near) == 64
    _write_embeddings(
        spark,
        tmp_path,
        [(0, base, 0), (7, base, 0), (3, orth, 0), (11, near, 0)],
    )
    out = (
        REGISTRY["decontaminate_semantic"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .set_index("train_id")
    )
    assert out.loc[7, "cosine"] == 1.0
    assert out.loc[7, "is_contaminated"] == 1
    assert out.loc[7, "nearest_eval_id"] == 0
    # the near-copy is caught too (cosine ~ 0.995 > 0.8)
    assert out.loc[11, "is_contaminated"] == 1
    # orthogonal vector never lands in the same hyperplane bucket with
    # cosine above threshold; if present it must be unflagged
    if 3 in out.index:
        assert out.loc[3, "is_contaminated"] == 0


def test_semantic_decon_sf_shape(spark):
    out = REGISTRY["decontaminate_semantic"].spark(spark, SF_DIR).toPandas()
    assert len(out) <= 100
    # one row per train id (nearest-only), sorted by cosine desc
    assert out.train_id.is_unique
    assert (out.cosine.values[:-1] >= out.cosine.values[1:]).all()
    # eval ids are the held-out set, train ids are not
    assert (out.nearest_eval_id % 50 == 0).all()
    assert (out.train_id % 50 != 0).all()
    # synthetic corpus has no true contamination at 0.8
    assert (out.is_contaminated == 0).all()


# --------------------------------------------------------------------------
# ops_column_lineage
# --------------------------------------------------------------------------


def test_lineage_diamond_and_roots(spark):
    out = (
        REGISTRY["ops_column_lineage"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index(["col", "anc"])
    )
    # diamond: report.margin reaches staging.o_totalprice through BOTH
    # gross_price and net_price
    r = out.loc[("report.margin", "staging.o_totalprice")]
    assert r.n_paths == 2 and r.min_depth == 2 and r.max_depth == 2
    # ...and both paths continue to the raw root at depth 3
    r = out.loc[("report.margin", "raw.o_totalprice")]
    assert r.n_paths == 2 and r.min_depth == 3
    assert r.is_root_source == 1
    # direct parents sit at depth 1 with one path
    r = out.loc[("curated.net_price", "staging.o_totalprice")]
    assert r.n_paths == 1 and r.min_depth == 1 and r.max_depth == 1
    # roots are exactly the raw.* and dim.* columns
    roots = {
        anc for (_, anc), row in out.iterrows() if row.is_root_source == 1
    }
    assert roots == {
        "raw.o_orderkey",
        "raw.o_custkey",
        "raw.o_orderdate",
        "raw.o_totalprice",
        "dim.nation_name",
    }
    # closure is reflexive-free and acyclic: no col reaches itself
    assert not any(c == a for (c, a) in out.index)


def test_lineage_depths_bounded_by_tiers(spark):
    out = REGISTRY["ops_column_lineage"].spark(spark, SF_DIR).toPandas()
    assert out.min_depth.min() == 1
    assert out.max_depth.max() == 3  # report -> curated -> staging -> raw
    # report.revenue_by_nation sees both the price chain and the dim root
    anc = set(
        out[out.col == "report.revenue_by_nation"].anc
    )
    assert {"curated.net_price", "staging.o_totalprice",
            "raw.o_totalprice", "dim.nation_name"} <= anc
