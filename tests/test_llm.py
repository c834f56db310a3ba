"""LLM-data operator tests: MinHash-LSH recall vs exact Jaccard, LSH
similarity recall on clustered vectors, multimodal plumbing, and the
decode stub contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.operators import dedup as dd
from gcp_de_data_pipeline_cc_spark.operators import multimodal as mm
from gcp_de_data_pipeline_cc_spark.operators.similarity import cosine_topk, cosine_topk_lsh
from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

def _pair_set(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_minhash_pairs_are_verified_subset_with_recall(spark):
    docs = load_table(spark, SF_DIR, "documents")
    exact = _pair_set(dd.ngram_jaccard_pairs(docs, threshold=0.5))
    approx = _pair_set(dd.minhash_lsh_pairs(docs, threshold=0.5))
    # verification pass guarantees no false positives
    assert approx <= exact
    if exact:
        recall = len(approx & exact) / len(exact)
        assert recall >= 0.7, f"minhash recall {recall:.2f} on {len(exact)} pairs"


def test_minhash_finds_planted_duplicates(spark):
    base = load_table(spark, SF_DIR, "documents").limit(50)
    # plant a shifted near-duplicate of every doc (drop first token)
    twins = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(F.split("text", " "), 2, 100000)
        ).alias("text"),
    )
    docs = base.select("doc_id", "text").unionByName(twins)
    pairs = _pair_set(dd.minhash_lsh_pairs(docs, threshold=0.5))
    planted = {(r.doc_id, r.doc_id + 100000) for r in base.select("doc_id").collect()}
    recall = len(pairs & planted) / len(planted)
    assert recall >= 0.9, f"planted-dup recall {recall:.2f}"


def test_simhash_identical_docs_share_signature(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g"), (3, "x y z w q r t")],
        "doc_id long, text string",
    )
    buckets = dd.simhash_buckets(docs).collect()
    assert any(set(r.members) == {1, 2} for r in buckets)


def test_exact_dedup_collapses_copies(spark):
    docs = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other text")],
        "doc_id long, text string",
    )
    out = {r.keep_doc_id: r.n_copies for r in dd.exact_dedup(docs).collect()}
    assert out == {1: 2, 3: 1}


# ---------------------------------------------------------------------------
# similarity
# ---------------------------------------------------------------------------

def test_lsh_topk_recall_on_clustered_vectors(spark):
    rng = np.random.RandomState(7)
    dim, n = 16, 40
    base = rng.standard_normal((n, dim))
    twins = base + 0.02 * rng.standard_normal((n, dim))
    rows = [(i, base[i].tolist()) for i in range(n)] + [
        (1000 + i, twins[i].tolist()) for i in range(n)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter(F.col("vec_id") >= 1000)

    exact1 = {
        r.query_id: r.neighbor_id
        for r in cosine_topk(queries, df, k=1).collect()
    }
    # exact top-1 of each twin must be its base vector
    assert all(exact1[1000 + i] == i for i in range(n))

    approx = cosine_topk_lsh(queries, df, k=1, n_tables=8, bits=4, dim=dim)
    approx1 = {r.query_id: r.neighbor_id for r in approx.collect()}
    hits = sum(approx1.get(1000 + i) == i for i in range(n))
    assert hits / n >= 0.8, f"LSH top-1 recall {hits / n:.2f}"


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------

def test_multimodal_features_deterministic(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(20)
    media = mm.attach_binary_payload(docs)
    f1 = sorted(map(tuple, mm.extract_features(media).collect()))
    f2 = sorted(map(tuple, mm.extract_features(media).collect()))
    assert f1 == f2 and len(f1) == 20
    # n_bytes must agree with the metadata struct
    meta = {r.doc_id: r.media_meta.n_bytes for r in media.collect()}
    for row in f1:
        assert row[1] == meta[row[0]]
    # features are a normalized histogram
    for row in f1:
        assert abs(sum(row[4]) - 1.0) < 1e-3


def test_frame_sample_counts(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(10)
    media = mm.attach_binary_payload(docs)
    sizes = {r.doc_id: r.media_meta.n_bytes for r in media.collect()}
    counts = (
        mm.frame_sample(media, every_n_bytes=64)
        .groupBy("doc_id")
        .count()
        .collect()
    )
    for r in counts:
        expected = -(-sizes[r.doc_id] // 64)  # ceil division
        assert r["count"] == expected


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError, match="image/png"):
        mm.decode_stub(b"\x89PNG", "image/png")


def test_connected_components_known_graph(spark):
    from gcp_de_data_pipeline_cc_spark.operators import dedup as dd

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 10), (20, 21)],
        ["src", "dst"],
    )
    got = {
        r.node: r.cluster_id
        for r in dd.connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_chain_needs_iterations(spark):
    # a path graph 0-1-2-...-9 has diameter 9: exercises the loop past
    # one round and the convergence cutoff
    from gcp_de_data_pipeline_cc_spark.operators import dedup as dd

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], ["src", "dst"]
    )
    rows = dd.connected_components(edges).collect()
    assert {r.cluster_id for r in rows} == {0}
    assert len(rows) == 10
    # pointer jumping (path doubling) collapses the same chain in
    # O(log d) rounds — same final labels
    jumped = dd.connected_components(edges, pointer_jump=True).collect()
    assert {r.cluster_id for r in jumped} == {0}
    assert len(jumped) == 10


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    # checkpoint_dir set → reliable checkpoint() lineage cuts (the real-
    # cluster fault-tolerant path); same result as localCheckpoint
    from gcp_de_data_pipeline_cc_spark.operators import dedup as dd

    ckpt = str(tmp_path / "cc_ckpt")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)] + [(100, 101)], ["src", "dst"]
    )
    got = {
        r.node: r.cluster_id
        for r in dd.connected_components(edges, checkpoint_dir=ckpt).collect()
    }
    want = {i: 0 for i in range(7)} | {100: 100, 101: 100}
    assert got == want
    import os

    assert os.listdir(ckpt), "reliable checkpoint dir should contain RDD data"


def test_ngram_jaccard_hash_join_mode_equivalent(spark):
    """join_on_hash=True (8-byte shuffle keys, the 100 TB profile) must
    produce the identical pair set and jaccard values as the string-join
    formulation on the test corpus."""
    from gcp_de_data_pipeline_cc_spark.catalog import load_table
    from gcp_de_data_pipeline_cc_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    by_str = {
        (r.doc_a, r.doc_b): round(r.jaccard, 9)
        for r in ngram_jaccard_pairs(docs).collect()
    }
    by_hash = {
        (r.doc_a, r.doc_b): round(r.jaccard, 9)
        for r in ngram_jaccard_pairs(docs, join_on_hash=True).collect()
    }
    assert by_str == by_hash and by_str
