"""Semantic laws for the r6b wave: grid-density clustering +
incremental dedup against a standing index."""

from __future__ import annotations

import hashlib

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# --------------------------------------------------------------------------
# geo_cluster_grid
# --------------------------------------------------------------------------


def _cell(ck, g=32):
    lat = (-6000 + (ck * 7919 % 12000) + 9000) * g // 18000
    lon = (-18000 + (ck * 104729 % 36000) + 18000) * g // 36000
    return lat, lon


def test_grid_clusters_match_python_flood_fill(spark):
    import duckdb

    custs = [
        k for (k,) in duckdb.sql(
            f"SELECT c_custkey FROM '{SF_DIR}/customer.parquet'"
        ).fetchall()
    ]
    counts = {}
    for k in custs:
        counts[_cell(k)] = counts.get(_cell(k), 0) + 1
    dense = {c for c, n in counts.items() if n >= 2}
    # flood fill over 8-connectivity
    seen, clusters = set(), []
    for c in dense:
        if c in seen:
            continue
        comp, stack = set(), [c]
        while stack:
            cur = stack.pop()
            if cur in comp:
                continue
            comp.add(cur)
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    nb = (cur[0] + di, cur[1] + dj)
                    if nb in dense and nb not in comp:
                        stack.append(nb)
        seen |= comp
        clusters.append(comp)
    expect = {}
    for comp in clusters:
        cid = min(la * 32 + lo for la, lo in comp)
        expect[cid] = (
            len(comp), sum(counts[c] for c in comp)
        )
    out = (
        REGISTRY["geo_cluster_grid"].spark(spark, SF_DIR).toPandas()
        .set_index("cluster_id")
    )
    assert set(out.index) == set(expect)
    for cid, (ncells, npts) in expect.items():
        assert out.loc[cid, "n_cells"] == ncells
        assert out.loc[cid, "n_points"] == npts


def test_grid_clusters_bounding_boxes(spark):
    out = REGISTRY["geo_cluster_grid"].spark(spark, SF_DIR).toPandas()
    assert len(out) > 0
    assert (out.lat_min <= out.lat_max).all()
    assert (out.lon_min <= out.lon_max).all()
    # a cluster's bbox area bounds its cell count
    area = (out.lat_max - out.lat_min + 1) * (out.lon_max - out.lon_min + 1)
    assert (out.n_cells <= area).all()
    # n_points >= minPts per cell
    assert (out.n_points >= 2 * out.n_cells).all()


# --------------------------------------------------------------------------
# dedup_incremental
# --------------------------------------------------------------------------


def _indexed(doc_id):
    return hashlib.md5(f"inc:{doc_id}".encode()).hexdigest()[:2] < "b3"


def test_incremental_shares_sum_to_one(spark):
    out = REGISTRY["dedup_incremental"].spark(spark, SF_DIR).toPandas()
    assert abs(out.share.sum() - 1.0) < 1e-4
    assert set(out.verdict) <= {"exact_dup", "near_dup", "new"}
    got = out.set_index("verdict")
    if "near_dup" in got.index:
        assert got.loc["near_dup", "mean_best_containment_ppm"] >= 800_000
    if "new" in got.index:
        assert got.loc["new", "mean_best_containment_ppm"] < 800_000


def test_incremental_planted_verdicts(spark, tmp_path):
    # find ids on each side of the coin to plant all three verdicts
    idx_ids = [i for i in range(400) if _indexed(i)]
    inc_ids = [i for i in range(400) if not _indexed(i)]
    base = ("alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lambda mu")
    near = base.rsplit(" ", 1)[0] + " omega"  # one tail word swapped
    rows = [
        (idx_ids[0], base, "en", "s", len(base)),       # the index doc
        (inc_ids[0], base, "en", "s", len(base)),       # exact dup
        (inc_ids[1], near, "en", "s", len(near)),       # near dup
        (inc_ids[2], "totally different words here now",
         "en", "s", 32),                                 # new
    ]
    spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = (
        REGISTRY["dedup_incremental"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .set_index("verdict")
    )
    assert out.loc["exact_dup", "n_docs"] == 1
    assert out.loc["near_dup", "n_docs"] == 1
    assert out.loc["new", "n_docs"] == 1
    # exact dup's containment evidence is 100%
    assert out.loc["exact_dup", "mean_best_containment_ppm"] == 1_000_000
    # the near dup shares 9 of its 10 shingles: 900000 ppm
    assert out.loc["near_dup", "mean_best_containment_ppm"] == 900_000
    assert out.loc["new", "mean_best_containment_ppm"] == 0
