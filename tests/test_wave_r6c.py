"""Semantic laws for the r6c wave: product quantization."""

from __future__ import annotations

import hashlib
import math

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _c0(vec_id, m):
    return int(
        hashlib.md5(f"{vec_id}:{m}".encode()).hexdigest()[:2], 16
    ) % 4


def test_pq_descent_invariant_and_usage(spark):
    out = REGISTRY["embedding_pq_codebook"].spark(spark, SF_DIR).toPandas()
    assert len(out) == 8
    # the k-means E-step can never raise SSE above the seed assignment
    assert out.improved.all()
    assert (out.sse_assigned <= out.sse_init).all()
    assert (out.n_used_centroids <= 4).all()
    assert (out.n_used_centroids >= 1).all()
    assert out.n_vectors.nunique() == 1


def test_pq_subspace_zero_matches_python(spark):
    import duckdb

    vecs = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet'"
    ).fetchall()
    # python recompute of subspace m=0 (dims 1..8)
    sub = {
        vid: [math.floor(float(x) * 1e6 + 0.5) for x in emb[:8]]
        for vid, emb in vecs
    }
    groups = {}
    for vid, q in sub.items():
        groups.setdefault(_c0(vid, 0), []).append(q)
    cents = {}
    for k, qs in groups.items():
        cents[k] = [
            math.floor(sum(col) / len(qs))
            for col in zip(*qs)
        ]
    sse_init, sse_assign = 0, 0
    used = set()
    for vid, q in sub.items():
        dists = {
            k: sum((a - b) ** 2 for a, b in zip(q, c))
            for k, c in cents.items()
        }
        sse_init += dists[_c0(vid, 0)]
        dmin = min(dists.values())
        kbest = min(k for k, d in dists.items() if d == dmin)
        used.add(kbest)
        sse_assign += dmin
    out = (
        REGISTRY["embedding_pq_codebook"].spark(spark, SF_DIR).toPandas()
        .set_index("subspace")
    )
    assert out.loc[0, "sse_init"] == sse_init
    assert out.loc[0, "sse_assigned"] == sse_assign
    assert out.loc[0, "n_used_centroids"] == len(used)


def test_pq_tight_clusters_quantize_losslessly(spark, tmp_path):
    # vectors exactly AT 4 distinct points per subspace: each seed
    # group's mean lands on a point only if the group is pure, but the
    # REASSIGNMENT step must still send every vector to the centroid
    # nearest its true point, and assigned SSE <= init SSE regardless.
    rows = []
    for i in range(64):
        val = float(i % 4)  # 4 exact levels repeated across all dims
        rows.append((i, [val] * 64, 0))
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = (
        REGISTRY["embedding_pq_codebook"]
        .spark(spark, str(tmp_path))
        .toPandas()
    )
    assert out.improved.all()
    assert (out.n_vectors == 64).all()
    # with 4 exact levels and random seeding, assigned SSE is strictly
    # below the (mixed-group) init SSE in every subspace
    assert (out.sse_assigned < out.sse_init).all()
