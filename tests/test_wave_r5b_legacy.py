"""Semantic laws for the r5b wave: release suppression + whitening."""

from __future__ import annotations

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _write_customers(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "c_custkey BIGINT, c_nationkey BIGINT, c_mktsegment STRING, "
        "c_acctbal DOUBLE",
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(
        [(i, f"N{i}") for i in range(5)],
        "n_nationkey BIGINT, n_name STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/nation.parquet")


# --------------------------------------------------------------------------
# privacy_cell_suppression
# --------------------------------------------------------------------------


def test_suppression_sf_consistency(spark):
    out = REGISTRY["privacy_cell_suppression"].spark(spark, SF_DIR).toPandas()
    # a suppressed cell never leaks its value
    supp = out[out.suppressed.notna()]
    assert supp.n.isna().all() and supp.bal_cents.isna().all()
    # published cells are all at or above the threshold
    pub = out[out.suppressed.isna()]
    assert (pub.n >= 5).all()
    # margins are full totals: per segment, published + withheld = total
    for seg, grp in out.groupby("segment"):
        assert grp.seg_total.nunique() == 1


def test_suppression_complementary_rule(spark, tmp_path):
    # segment 'S': nation 0 has 2 customers (< 5, primary), nations
    # 1..3 have 6,7,8 -> exactly one primary => smallest survivor
    # (nation 1) must be complementarily suppressed
    rows = []
    ck = 0
    for nk, cnt in [(0, 2), (1, 6), (2, 7), (3, 8)]:
        for _ in range(cnt):
            ck += 1
            rows.append((ck, nk, "S", 10.0))
    # segment 'T': two primaries (1,1) and big cells -> margin ambiguity
    # already exists, NO complementary suppression
    for nk, cnt in [(0, 1), (1, 1), (2, 9), (3, 9)]:
        for _ in range(cnt):
            ck += 1
            rows.append((ck, nk, "T", 10.0))
    _write_customers(spark, tmp_path, rows)
    out = (
        REGISTRY["privacy_cell_suppression"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .set_index(["segment", "nation"])
    )
    assert out.loc[("S", "N0"), "suppressed"] == "primary"
    assert out.loc[("S", "N1"), "suppressed"] == "complementary"
    assert out.loc[("S", "N2"), "suppressed"] is None
    assert out.loc[("T", "N0"), "suppressed"] == "primary"
    assert out.loc[("T", "N1"), "suppressed"] == "primary"
    t_rest = out.loc[[("T", "N2"), ("T", "N3")]]
    assert t_rest.suppressed.isna().all()


# --------------------------------------------------------------------------
# embedding_whitening
# --------------------------------------------------------------------------


def test_whitening_audit_holds(spark):
    out = REGISTRY["embedding_whitening"].spark(spark, SF_DIR).toPandas()
    assert len(out) == 64
    assert (out.n == out.n.iloc[0]).all()
    # the applied transform is certified inside the query itself
    assert (out.post_mean.abs() <= 2e-6).all()
    assert ((out.post_std - 1.0).abs() <= 1e-3).all()
    assert (out["std"] > 0).all()


def test_whitening_recompute_from_source(spark):
    import duckdb
    import numpy as np

    out = (
        REGISTRY["embedding_whitening"].spark(spark, SF_DIR).toPandas()
        .set_index("dim")
    )
    vecs = duckdb.sql(
        f"SELECT embedding FROM '{SF_DIR}/embeddings.parquet'"
    ).df()
    m = np.array([np.array(v, dtype=np.float64) for v in vecs.embedding])
    q = np.floor(m * 1e6 + 0.5)
    mu = q.mean(axis=0) / 1e6
    sd = q.std(axis=0) / 1e6
    for d in range(64):
        assert abs(out.loc[d + 1, "mean"] - round(mu[d], 6)) < 2e-6
        assert abs(out.loc[d + 1, "std"] - round(sd[d], 6)) < 2e-6
