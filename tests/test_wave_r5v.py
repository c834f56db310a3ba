"""Semantic laws for the r5v wave: HHI concentration + DPO preference
pairs."""

from __future__ import annotations

import hashlib

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# --------------------------------------------------------------------------
# agg_hhi
# --------------------------------------------------------------------------


def test_hhi_matches_python_recompute(spark):
    import duckdb

    out = (
        REGISTRY["agg_hhi"].spark(spark, SF_DIR).toPandas()
        .set_index("nation")
    )
    rev = duckdb.sql(
        f"""
        SELECT c.c_nationkey nk, n.n_name nation, o.o_custkey,
               SUM(CAST(FLOOR(o.o_totalprice*100.0+0.5) AS BIGINT)) cents
        FROM '{SF_DIR}/orders.parquet' o
        JOIN '{SF_DIR}/customer.parquet' c ON o.o_custkey = c.c_custkey
        JOIN '{SF_DIR}/nation.parquet' n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2, 3
        """
    ).df()
    for nation, grp in rev.groupby("nation"):
        total = int(grp.cents.sum())
        hhi_q = sum(
            (int(c) * 1_000_000 // total) ** 2 for c in grp.cents
        )
        assert out.loc[nation, "hhi"] == hhi_q / 1e12
        assert out.loc[nation, "n_firms"] == len(grp)


def test_hhi_bounds_and_bands(spark):
    out = REGISTRY["agg_hhi"].spark(spark, SF_DIR).toPandas()
    # ppm flooring only loses mass: 1/N <= true HHI, quantized <= 1
    assert ((out.hhi > 0) & (out.hhi <= 1.0)).all()
    # effective N never exceeds the firm count (and is >= 1)
    assert (out.effective_n <= out.n_firms + 1e-9).all()
    assert (out.effective_n >= 1.0).all()
    # normalized HHI in [~0, 1]; flooring can push epsilon below 0
    assert ((out.hhi_normalized > -1e-3) & (out.hhi_normalized <= 1)).all()
    band = out.set_index("nation").doj_band
    hhi = out.set_index("nation").hhi
    for nation in band.index:
        expect = (
            "competitive" if hhi[nation] < 0.15
            else "moderate" if hhi[nation] < 0.25
            else "concentrated"
        )
        assert band[nation] == expect


def test_hhi_monopoly_degenerates_to_one(spark, tmp_path):
    import datetime

    rows = [
        # nation 0: single customer = monopoly -> HHI 1
        (1, 10, "O", 100.0, datetime.datetime(2024, 1, 1), "1-A"),
        (2, 10, "O", 300.0, datetime.datetime(2024, 1, 2), "1-A"),
        # nation 1: two equal customers -> HHI 0.5
        (3, 20, "O", 100.0, datetime.datetime(2024, 1, 1), "1-A"),
        (4, 21, "O", 100.0, datetime.datetime(2024, 1, 2), "1-A"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, "
        "o_orderpriority STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [(10, 0), (20, 1), (21, 1)],
        "c_custkey BIGINT, c_nationkey BIGINT",
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(
        [(0, "MONO"), (1, "DUO")],
        "n_nationkey BIGINT, n_name STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/nation.parquet")
    out = (
        REGISTRY["agg_hhi"].spark(spark, str(tmp_path)).toPandas()
        .set_index("nation")
    )
    assert out.loc["MONO", "hhi"] == 1.0
    assert out.loc["MONO", "doj_band"] == "concentrated"
    assert out.loc["DUO", "hhi"] == 0.5
    assert abs(out.loc["DUO", "effective_n"] - 2.0) < 1e-9


# --------------------------------------------------------------------------
# train_preference_pairs
# --------------------------------------------------------------------------


def _reward(doc_id):
    return int(
        hashlib.md5(f"rm:{doc_id}".encode()).hexdigest()[:6], 16
    )


def test_preference_pairs_laws(spark):
    out = REGISTRY["train_preference_pairs"].spark(spark, SF_DIR).toPandas()
    assert len(out) > 0
    # margins all clear the threshold and match the reward channel
    assert (out.margin >= 1_000_000).all()
    for _, p in out.iterrows():
        assert _reward(p.chosen_id) - _reward(p.rejected_id) == p.margin
    # disjointness: no doc appears twice anywhere
    used = list(out.chosen_id) + list(out.rejected_id)
    assert len(used) == len(set(used))


def test_preference_pairs_python_recompute(spark, tmp_path):
    # 7 docs in one source: floor(7/2) = 3 max-spread pairs; the median
    # doc is left unpaired.
    rows = [(i, "t", "en", "src", 1) for i in range(7)]
    spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    ranked = sorted(range(7), key=lambda i: (-_reward(i), i))
    expect = []
    for i in range(3):
        c, r = ranked[i], ranked[6 - i]
        m = _reward(c) - _reward(r)
        if m >= 1_000_000:
            expect.append((i + 1, c, r, m))
    out = (
        REGISTRY["train_preference_pairs"]
        .spark(spark, str(tmp_path))
        .toPandas()
    )
    got = [
        (int(p.pair_idx), int(p.chosen_id), int(p.rejected_id),
         int(p.margin))
        for _, p in out.sort_values("pair_idx").iterrows()
    ]
    assert got == expect
