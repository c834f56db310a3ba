"""Semantic tests for corpus wave 4 (plans/corpus4.py): the
boilerplate-rewrite reconstruction law, logistic-score calibration
properties, and fertility-audit conservation.

Value correctness is covered by the auto-parametrized differential
suite; these pin the operator *properties* — laws that must hold
independent of the fixture's numbers.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _lines_rewrite(spark):
    return REGISTRY["dedup_lines_rewrite"].spark(spark, SF_DIR)


def test_lines_rewrite_untouched_docs_roundtrip_exactly(spark):
    """A document with zero dropped blocks must reassemble to its
    original text verbatim — blocks partition the token stream, so
    order-preserving concat of all of them is the identity."""
    out = _lines_rewrite(spark)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    clean = out.filter(F.col("n_dropped") == 0).join(docs, "doc_id")
    n_clean = clean.count()
    assert n_clean > 0, "fixture should contain boilerplate-free docs"
    assert clean.filter(F.col("clean_text") != F.col("text")).count() == 0


def test_lines_rewrite_accounting_and_token_conservation(spark):
    """n_dropped <= n_blocks everywhere; every doc appears exactly once;
    and the cleaned token count equals the original count minus the
    tokens inside dropped blocks (tail blocks may be short, so bound it
    instead of assuming 10 per block)."""
    out = _lines_rewrite(spark).cache()
    try:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        assert out.count() == docs.count()
        assert out.filter(F.col("n_dropped") > F.col("n_blocks")).count() == 0

        joined = out.join(docs, "doc_id").select(
            F.size(F.split("text", " ")).alias("n_orig"),
            F.when(
                F.col("clean_text") == "", F.lit(0)
            ).otherwise(F.size(F.split("clean_text", " "))).alias("n_clean"),
            "n_blocks",
            "n_dropped",
        )
        # dropped tokens land in [1, 10] per dropped block
        bad = joined.filter(
            (F.col("n_orig") - F.col("n_clean") > F.col("n_dropped") * 10)
            | (
                (F.col("n_dropped") > 0)
                & (F.col("n_orig") - F.col("n_clean") < F.col("n_dropped"))
            )
            | ((F.col("n_dropped") == 0) & (F.col("n_clean") != F.col("n_orig")))
        )
        assert bad.count() == 0
    finally:
        out.unpersist()


def test_lines_rewrite_no_surviving_cross_doc_block(spark):
    """After the rewrite, re-running block extraction over the cleaned
    corpus must find no FULL block that appeared in >=2 docs before —
    the dropped spans are gone (fresh block boundaries can create new
    coincidental overlaps; the law is about the original spans)."""
    out = _lines_rewrite(spark)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = docs.select("doc_id", F.split("text", " ").alias("t"))
    n_blk = F.ceil(F.size("t") / 10.0).cast("long")
    spans = base.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_blk - 1),
                lambda i: F.concat_ws(" ", F.slice(F.col("t"), i * 10 + 1, 10)),
            )
        ).alias("span"),
    )
    hot = {
        r.span
        for r in spans.groupBy("span")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= 2)
        .select("span")
        .collect()
    }
    assert hot, "fixture should contain shared blocks"
    # independent driver-side reconstruction: re-blocking each original
    # doc and joining the non-hot blocks in order must reproduce
    # clean_text exactly (the fixture is 500 docs — test-scale only)
    got = {r.doc_id: r.clean_text for r in out.collect()}
    for row in docs.select("doc_id", "text").collect():
        toks = row.text.split(" ")
        blocks = [
            " ".join(toks[i : i + 10]) for i in range(0, len(toks), 10)
        ]
        expect = " ".join(b for b in blocks if b not in hot)
        assert got[row.doc_id] == expect, row.doc_id


def test_quality_logistic_scores_calibrated_and_consistent(spark):
    out = REGISTRY["quality_logistic"].spark(spark, SF_DIR).cache()
    try:
        assert out.filter((F.col("score") < 0) | (F.col("score") > 1)).count() == 0
        # keep thresholds the unrounded score; the rounded score may sit
        # exactly at 0.5 either way, but away from the boundary the two
        # must agree
        off_boundary = out.filter(F.abs(F.col("score") - 0.5) > 0.001)
        disagree = off_boundary.filter(
            F.col("keep") != (F.col("score") >= 0.5)
        )
        assert disagree.count() == 0
        # the gate must actually discriminate on this corpus
        kept = out.filter("keep").count()
        assert 0 < kept < out.count()
    finally:
        out.unpersist()


def test_token_fertility_conserves_totals(spark):
    out = REGISTRY["token_fertility"].spark(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    totals = out.agg(
        F.sum("n_docs").alias("d"),
        F.sum("n_tokens").alias("t"),
        F.sum("n_chars").alias("c"),
    ).first()
    exp = docs.select(
        F.size(F.split("text", " ")).alias("nt"),
        F.length(F.regexp_replace("text", " ", "")).alias("nc"),
    ).agg(F.count("*"), F.sum("nt"), F.sum("nc")).first()
    assert (totals.d, totals.t, totals.c) == (exp[0], exp[1], exp[2])
    # fertility is chars/token of space-free text: >= 1 everywhere
    assert out.filter(F.col("chars_per_token") < 1).count() == 0


# ---- retail-analytics wave (plans/analytics4.py) ----


def test_market_basket_metric_laws(spark):
    """conf >= support in both directions (n_item <= n_orders), the
    support floor holds, pairs are canonically oriented, and output is
    lift-ordered."""
    rows = REGISTRY["market_basket"].spark(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.brand_a < r.brand_b
        assert r.n_pair >= 10
        assert r.conf_a_to_b >= r.support - 1e-12
        assert r.conf_b_to_a >= r.support - 1e-12
        assert r.lift > 0
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_rfm_scores_balanced_and_code_consistent(spark):
    rows = REGISTRY["rfm_segments"].spark(spark, SF_DIR).collect()
    n = len(rows)
    assert n > 0
    from collections import Counter

    for dim in ("r_score", "f_score", "m_score"):
        scores = [getattr(r, dim) for r in rows]
        assert set(scores) <= {1, 2, 3, 4, 5}
        sizes = Counter(scores)
        # row_number quintiles are balanced to within one row
        assert max(sizes.values()) - min(sizes.values()) <= 1, (dim, sizes)
    for r in rows:
        assert r.rfm_code == r.r_score * 100 + r.f_score * 10 + r.m_score
        assert r.recency_days >= 0 and r.frequency >= 1


def test_cohort_new_returning_conservation(spark):
    out = REGISTRY["cohort_new_returning"].spark(spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    total_orders = orders.count()
    total_cust = orders.select("o_custkey").distinct().count()
    total_cents = orders.select(
        F.sum(
            F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
        ).alias("c")
    ).first().c
    assert sum(r.n_orders for r in out) == total_orders
    assert sum(r.n_new_customers for r in out) == total_cust
    assert (
        sum(r.new_revenue_cents + r.returning_revenue_cents for r in out)
        == total_cents
    )
    for r in out:
        assert r.n_new_orders <= r.n_orders
        assert r.n_new_customers <= r.n_new_orders
    # the earliest month is acquisition-only by construction
    first = min(out, key=lambda r: r.month)
    assert first.n_new_orders == first.n_orders


# ---- wave E: URL canonicalization + centroid drift ----


def test_url_canonical_output_is_fully_canonical(spark):
    out = REGISTRY["dedup_url_canonical"].spark(spark, SF_DIR).cache()
    try:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        # every document lands in exactly one canonical group
        assert out.agg(F.sum("n_docs")).first()[0] == docs.count()
        # no residual noise may survive canonicalization
        dirty = out.filter(
            F.col("canonical_url").rlike("[A-Z]|#|utm_|:443|/$")
        )
        assert dirty.count() == 0
        # the synthesized noise must actually exercise the collapse
        assert out.filter("is_dup").count() > 0
        assert out.filter(F.col("n_raw_variants") > 1).count() > 0
        bad = out.filter(F.col("n_raw_variants") > F.col("n_docs"))
        assert bad.count() == 0
    finally:
        out.unpersist()


def test_centroid_drift_two_orthogonal_cohorts(spark, tmp_path):
    """Two cohorts pinned at orthogonal unit vectors sit sqrt(0.5) from
    the midpoint global centroid — exact by construction."""
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [1.0, 0.0], 0),
        (3, [0.0, 1.0], 1),
        (4, [0.0, 1.0], 1),
    ]
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = {
        r.label: r
        for r in REGISTRY["embedding_centroid_drift"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    import math

    want = round(math.sqrt(0.5), 4)
    assert out[0].n_vecs == 2 and out[1].n_vecs == 2
    assert abs(out[0].drift - want) < 1e-9
    assert abs(out[1].drift - want) < 1e-9


def test_centroid_drift_fixture_conservation(spark):
    out = REGISTRY["embedding_centroid_drift"].spark(spark, SF_DIR)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = out.collect()
    assert sum(r.n_vecs for r in rows) == emb.count()
    assert all(r.drift >= 0 for r in rows)
    # a single-label corpus would have zero drift; the fixture has many
    assert any(r.drift > 0 for r in rows)
